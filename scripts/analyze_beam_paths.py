"""Op-level traffic accounting: lineage beam vs physical-reorder beam.

VERDICT r2 #5 asked for a measured win over the 0.09-MFU fast beam *or* a
quantified op-level proof. This script is the proof half (the measured A/B
runs on-chip via bench_all.py): it traces ONE composed beam step
(reorder + KV-cached stepper) for both modes at serving shapes and walks the
jaxpr to count

  - bytes produced by gather ops (the reorder's physical cost; each gathered
    byte is also a byte read, so HBM traffic ~= 2x this), and
  - matmul FLOPs (the lineage attention's extra cost: scores are computed
    against all K source rows and contracted with the one-hot ancestry mask).

Backend-neutral (trace-time, ShapeDtypeStruct inputs — nothing materialized,
no chip needed). Token identity between the two paths is proven in
tests/test_decode_transformer.py; the small-shape invariants are locked in
tests/test_beam_traffic.py.

Usage: python scripts/analyze_beam_paths.py [--batch 128] [--beam 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from vcr_tpu.models import base
import vcr_tpu.models.transformer as tr
from vcr_tpu.utils.benchutil import jaxpr_flops, jaxpr_gather_bytes


def beam_step_fns(spec, batch, k, lineage):
    """(no_reorder_fn, with_reorder_fn, abstract args) for one beam step.
    The delta between the two isolates the per-step reorder exactly."""

    def build(params, e_out):
        out = tr.make_cached_stepper(params, spec, e_out, beam_tile=k,
                                     lineage=lineage)
        reorder = (out[2] if lineage
                   else lambda s, f: jax.tree_util.tree_map(lambda x: x[f], s))
        return out[0], out[1], reorder

    def no_reorder(params, e_out, state, words):
        step_fn, _, _ = build(params, e_out)
        _, logits = step_fn(state, words, jnp.int32(2))
        return logits

    def with_reorder(params, e_out, state, words, flat_src):
        step_fn, _, reorder = build(params, e_out)
        _, logits = step_fn(reorder(state, flat_src), words, jnp.int32(2))
        return logits

    key = jax.random.PRNGKey(0)
    glove_s = jax.ShapeDtypeStruct((spec.vocab_size, spec.embed_size),
                                   jnp.float32)
    params_s = jax.eval_shape(lambda kk, g: tr.init_params(kk, spec, g),
                              key, glove_s)
    e_s = jax.ShapeDtypeStruct((batch, spec.num_frames, spec.vid_feat_size),
                               jnp.float32)
    state_s = jax.eval_shape(lambda p, e: build(p, e)[1], params_s, e_s)
    rows = batch * k
    words_s = jax.ShapeDtypeStruct((rows,), jnp.int32)
    flat_s = jax.ShapeDtypeStruct((rows,), jnp.int32)
    return no_reorder, with_reorder, (params_s, e_s, state_s, words_s, flat_s)


def analyze(spec, batch, k, lineage):
    no_re, with_re, (p, e, st, w, f) = beam_step_fns(spec, batch, k, lineage)
    return {
        "reorder_gather_bytes": (jaxpr_gather_bytes(with_re, p, e, st, w, f)
                                 - jaxpr_gather_bytes(no_re, p, e, st, w)),
        "step_flops": jaxpr_flops(with_re, p, e, st, w, f),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--vocab", type=int, default=9000)
    a = ap.parse_args(argv)

    spec = base.ModelSpec(
        arch="transformer", vocab_size=a.vocab, embed_size=300,
        hidden_size=512, vid_feat_size=4096, max_len=20, num_frames=30,
        dropout_p=0.0, sos_id=1, compute_dtype="bfloat16",
        tf_layers=6, tf_heads=8)
    rows = a.batch * a.beam
    d_k = spec.hidden_size // spec.tf_heads
    cache_bytes = (spec.tf_layers * 2 * rows * spec.tf_heads * spec.max_len
                   * d_k * jnp.dtype(spec.compute_dtype).itemsize)

    g = analyze(spec, a.batch, a.beam, lineage=False)
    ln = analyze(spec, a.batch, a.beam, lineage=True)

    # v5e machine balance: ~197e12 bf16 FLOP/s vs ~819e9 B/s HBM -> ~240
    # FLOP must ride along per byte moved, else the step is bandwidth-bound.
    saved_traffic = 2 * (g["reorder_gather_bytes"] - ln["reorder_gather_bytes"])
    extra_flops = ln["step_flops"] - g["step_flops"]
    balance = 197e12 / 819e9

    out = {
        "shape": {"batch": a.batch, "beam": a.beam, "rows": rows,
                  "kv_cache_bytes": cache_bytes},
        "gather_path": g,
        "lineage_path": ln,
        "reorder_bytes_ratio": (g["reorder_gather_bytes"]
                                / max(ln["reorder_gather_bytes"], 1.0)),
        "per_step_hbm_saved_bytes": saved_traffic,
        "per_step_extra_flops": extra_flops,
        "extra_flops_affordable_at_balance": extra_flops < saved_traffic * balance,
    }
    print(json.dumps(out, indent=2))
    print()
    print(f"per-step reorder: gather path moves "
          f"{g['reorder_gather_bytes'] / 1e6:.2f} MB gathered "
          f"(~{2 * g['reorder_gather_bytes'] / 1e6:.2f} MB HBM traffic), "
          f"lineage path {ln['reorder_gather_bytes'] / 1e3:.2f} KB "
          f"-> {out['reorder_bytes_ratio']:.0f}x less reorder traffic")
    print(f"lineage extra FLOPs/step {extra_flops / 1e6:.1f} MF vs "
          f"{saved_traffic * balance / 1e6:.1f} MF affordable at v5e machine "
          f"balance -> lineage is "
          f"{'a net win' if out['extra_flops_affordable_at_balance'] else 'NOT a net win'} "
          f"if the reorder was bandwidth-bound (on-chip A/B: bench_all.py)")
    return out


if __name__ == "__main__":
    main()
