"""Op-level cost profile of the continuous-batching pool's tick.

Hardware-independent evidence (jaxpr walk, like
``scripts/analyze_beam_paths.py``) for how the slot pool's device tick
spends its budget, per family and geometry:

  - FLOPs per tick and per decoded token (slots x step_chunk tokens/tick);
  - gather/scatter bytes per tick — the continuous design's claim is that
    admission scatters and bookkeeping are TINY next to the cell math, and
    that the transformer's beam mode moves only the ancestry matrix (the
    lineage technique) while the GRU families' physical reorder touches
    only their small recurrent state;
  - the arithmetic intensity (FLOPs / moved byte) those two numbers imply,
    to compare against the chip's compute:bandwidth balance.

Run: ``python scripts/analyze_slot_tick.py [--beam K] [--platform cpu]``.
One JSON line per family + a summary. Works on any backend (it only traces).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def analyze(arch: str, *, slots: int, step_chunk: int, beam: int, seed: int):
    import jax

    from vcr_tpu.models import base as mbase
    from vcr_tpu.serving_continuous import ContinuousCaptioner
    from vcr_tpu.utils.benchutil import jaxpr_flops, jaxpr_gather_bytes

    rng = np.random.default_rng(seed)
    if arch == "transformer":
        spec = mbase.ModelSpec(
            arch="transformer", vocab_size=512, embed_size=300,
            hidden_size=512, vid_feat_size=4096, max_len=20, num_frames=8,
            dropout_p=0.0, sos_id=508, compute_dtype="float32",
            tf_layers=2, tf_heads=4)
        from vcr_tpu.models import transformer as trm

        params = trm.init_params(jax.random.PRNGKey(seed), spec,
                                 rng.standard_normal((512, 300)).astype(
                                     np.float32))
    else:
        spec = mbase.ModelSpec(
            arch=arch, vocab_size=512, embed_size=300, hidden_size=256,
            vid_feat_size=512, max_len=20, num_frames=8, dropout_p=0.0,
            sos_id=508, compute_dtype="float32")
        from vcr_tpu.models import base

        params = base.build_model(arch)[0](
            jax.random.PRNGKey(seed), spec,
            rng.standard_normal((512, 300)).astype(np.float32))

    cc = ContinuousCaptioner(params, spec, slots=slots, admit_chunk=1,
                             step_chunk=step_chunk, eos_id=509,
                             beam_size=beam)
    step = cc._step_n if beam == 1 else cc._step_n_beam
    flops = jaxpr_flops(step, cc.params, cc.state)
    moved = jaxpr_gather_bytes(step, cc.params, cc.state)
    tokens = slots * step_chunk
    # KV-cache footprint for context (transformer beam: the lineage claim)
    kv_bytes = 0
    if arch == "transformer":
        kv_bytes = sum(
            np.prod(leaf.shape) * leaf.dtype.itemsize
            for k, leaves in cc.state["dec"].items() if k.startswith("x")
            for leaf in leaves)
    return {
        "arch": arch,
        "beam": beam,
        "slots": slots,
        "step_chunk": step_chunk,
        "tick_flops": flops,
        "flops_per_token": flops / tokens if flops else None,
        "tick_gather_scatter_bytes": moved,
        "bytes_per_token": moved / tokens if moved else None,
        "flops_per_moved_byte": (flops / moved) if flops and moved else None,
        "kv_cache_bytes": int(kv_bytes),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--step_chunk", type=int, default=4)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. cpu) before first use")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    rows = []
    for arch in ("s2vt", "s2vt-att", "transformer"):
        row = analyze(arch, slots=args.slots, step_chunk=args.step_chunk,
                      beam=args.beam, seed=args.seed)
        print(json.dumps(row), flush=True)
        rows.append(row)
    tf = rows[-1]
    if tf["tick_gather_scatter_bytes"] and tf["kv_cache_bytes"]:
        ratio = tf["kv_cache_bytes"] / max(
            tf["tick_gather_scatter_bytes"] / args.step_chunk, 1.0)
        print(json.dumps({
            "summary": "transformer per-STEP moved bytes vs full KV cache",
            "kv_cache_bytes": tf["kv_cache_bytes"],
            "moved_bytes_per_step":
                tf["tick_gather_scatter_bytes"] / args.step_chunk,
            "kv_to_moved_ratio": round(ratio, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
