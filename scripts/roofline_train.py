#!/usr/bin/env python
"""Roofline verdict for a family's full train step on the live backend.

VERDICT r3 #3 asks either for s2vt-att train ≥0.30 MFU / ≥50k videos/s, or a
committed roofline proof that the step is memory-bound. This script produces
that proof (or disproof) from XLA's own post-fusion cost model:

  * builds the PRODUCT train step (train.step.build_step_fns — the same
    program `--mode train` runs), jit-lowers and compiles it, and reads
    `compiled.cost_analysis()` — flops and bytes accessed AFTER fusion, the
    authoritative traffic numbers for this backend's compiler;
  * computes the roofline time bounds  t_flops = F / peak_flops  and
    t_bytes = B / peak_bw  (TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM) and the
    arithmetic intensity vs the machine balance (~240 FLOP/byte);
  * optionally (--measure) times the real step with bench_train's chained
    discipline and reports measured-vs-bound ratios: measured ≈ t_bytes ≫
    t_flops is the memory-bound signature.

  python scripts/roofline_train.py --arch s2vt-att --batches 512,1024,2048
  python scripts/roofline_train.py --arch s2vt-att --measure   # on the TPU

One JSON line per (arch, batch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v5e peaks; CPU runs still print cost numbers but the bounds are TPU-framed
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="s2vt-att")
    ap.add_argument("--batches", default="512,1024,2048")
    ap.add_argument("--measure", action="store_true",
                    help="also time the compiled step (chained, on-device)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from vcr_tpu.utils import backend_probe

    ok, diag = backend_probe.ensure_backend()
    if not ok:
        print(f"backend unavailable: {diag}", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp

    from vcr_tpu.models import base
    from vcr_tpu.train import optim
    from vcr_tpu.train.step import build_step_fns
    from vcr_tpu.utils import benchutil

    vocab_size, embed = 9000, 300
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((vocab_size, embed)).astype(np.float32)
    device = jax.devices()[0]

    spec_kw = dict(
        arch=args.arch, vocab_size=vocab_size, embed_size=embed,
        hidden_size=512, vid_feat_size=512, max_len=20, num_frames=30,
        dropout_p=0.2, sos_id=vocab_size - 4, compute_dtype="bfloat16",
        vocab_pad_to=128)
    if args.arch == "transformer":
        spec_kw.update(vid_feat_size=4096)
    spec = base.ModelSpec(**spec_kw)
    params = jax.device_put(
        base.build_model(args.arch)[0](jax.random.PRNGKey(0), spec, glove))
    opt = optim.build_optimizer("adam", 1e-4, 4e-5, 1.0)
    opt_state = jax.device_put(opt.init(params))
    train_step, _ = build_step_fns(args.arch, spec, opt, 0.0, 0.0)
    key = jax.random.PRNGKey(1)

    for b in [int(x) for x in args.batches.split(",") if x]:
        batch = {
            "vid_feats": jax.device_put(
                rng.standard_normal((b, spec.num_frames, spec.vid_feat_size))
                .astype(np.float32)).astype(jnp.bfloat16),
            "sent": jax.device_put(
                rng.integers(0, vocab_size, (b, spec.max_len)
                             ).astype(np.int32)),
            "sent_len": jax.device_put(np.full((b,), 12, np.int32)),
            "valid": jax.device_put(np.ones((b,), np.float32)),
        }

        step1 = jax.jit(lambda p, s, bt, k: train_step(p, s, bt, k, 1.0))
        compiled = step1.lower(params, opt_state, batch, key).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        t_fl = flops / PEAK_FLOPS
        t_by = bytes_acc / PEAK_BW
        bound = max(t_fl, t_by)
        row = {
            "metric": f"{args.arch} train step roofline B={b}",
            "xla_flops": flops,
            "xla_bytes_accessed": bytes_acc,
            "arith_intensity_flops_per_byte":
                round(flops / bytes_acc, 2) if bytes_acc else None,
            "machine_balance": round(PEAK_FLOPS / PEAK_BW, 1),
            "t_flops_ms": round(t_fl * 1e3, 3),
            "t_bytes_ms": round(t_by * 1e3, 3),
            "bound_ms": round(bound * 1e3, 3),
            "verdict": ("memory-bound" if t_by > 2 * t_fl else
                        "compute-bound" if t_fl > 2 * t_by else "balanced"),
        }
        if args.measure:
            @jax.jit
            def run_n(p, s, bt, k):
                def body(c, _):
                    p2, s2, m, _ = train_step(c[0], c[1], bt, k, 1.0)
                    return (p2, s2), m["loss"]
                (p, s), losses = jax.lax.scan(body, (p, s), None,
                                              length=args.iters)
                return losses[-1]

            dt, _f, _m = benchutil.time_chained(run_n,
                                                (params, opt_state, batch,
                                                 key), device)
            step_ms = dt / args.iters * 1e3
            row["measured_ms"] = round(step_ms, 3)
            row["measured_over_bound"] = round(step_ms / (bound * 1e3), 2)
            row["videos_per_s"] = round(b * args.iters / dt, 1)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
