#!/usr/bin/env python
"""Achievable-HBM-bandwidth calibration sweep (round 4).

The roofline scripts divide by the v5e spec sheet's 819 GB/s, but the first
measured stream (diag_s2vt_att_bisect.log) sustained only ~265 GB/s — a 3×
gap that decides whether "memory-bound" programs are at their floor or 3×
off it. This sweep separates the candidate causes:

  * layout: 1-D vs 2-D (sublane×lane-tiled) arrays;
  * dtype: bf16 (2 B/elem, more VPU elems/byte) vs f32;
  * op mix: triad (2R+1W) vs copy-scale (1R+1W) vs reduce (1R, no write);
  * size: does a bigger working set amortize better?

All runs are chained inside ONE jit (tunnel dispatch excluded). One JSON
line each: achieved GB/s against the 819 spec.

Measured (onchip_r4/diag_hbm_bw2.log): triad sustains ~316-343 GB/s at
256 MB working sets and ~549-557 GB/s at 1 GB (39-68% of spec); copy
~200-420, reads-only ~113-348. Layout (1d/2d) and dtype barely matter.
The size dependence fits a ~1.8 ms FIXED cost per scan iteration plus a
~600-660 GB/s stream rate — so short-per-iteration programs see far less
than spec. Roofline claims should use ~0.4-0.65x of the 819 spec as the
achievable denominator at training-sized working sets.

Run on the real TPU: python scripts/diag_hbm_bw.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcr_tpu.utils import backend_probe

_ok, _diag = backend_probe.ensure_backend()
if not _ok:
    print(f"backend unavailable: {_diag}", file=sys.stderr)
    sys.exit(2)

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("VCR_DIAG_ITERS", "20"))
PEAK = 819e9


def timed(fn, *args):
    out = jax.jit(fn)
    np.asarray(out(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(out(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def emit(name, dt, moved_bytes):
    print(json.dumps({
        "metric": name, "step_ms": round(dt * 1e3, 3),
        "gb_per_s": round(moved_bytes / dt / 1e9, 1),
        "pct_of_819": round(100 * moved_bytes / dt / PEAK, 1),
    }), flush=True)


def main() -> int:
    mbs = [int(m) for m in os.environ.get("VCR_DIAG_MB", "256,1024").split(",")]
    for dtype, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        esize = jnp.dtype(dtype).itemsize
        for mb in mbs:
            n = mb * 1024 * 1024 // esize
            for shape, sname in ((n,), "1d"), ((n // 512, 512), "2d"):
                x = jnp.ones(shape, dtype)
                y = jnp.ones(shape, dtype) * 0.5

                # the FULL ARRAY is the scan carry: every iteration must
                # materialize it (the write cannot fuse away), and reads of
                # x/y/c cannot be sliced or hoisted (c changes per step)
                def triad(x_, y_):
                    def body(c, _):
                        return x_ + jnp.asarray(0.999, x_.dtype) * (y_ + c), \
                            None
                    c, _ = jax.lax.scan(body, jnp.zeros_like(x_), None,
                                        length=ITERS)
                    return c.ravel()[0].astype(jnp.float32)

                dt = timed(triad, x, y)
                emit(f"triad {dname} {sname} {mb}MB (3R+1W)", dt,
                     4 * n * esize)

                def copys(x_):
                    # 1 - 2^-8: exactly representable in bf16 (0.9999997
                    # would round to 1.0 and XLA elides the whole loop)
                    def body(c, _):
                        return c * jnp.asarray(0.99609375, x_.dtype), None
                    c, _ = jax.lax.scan(body, x_ + 1, None, length=ITERS)
                    return c.ravel()[0].astype(jnp.float32)

                dt = timed(copys, x)
                emit(f"copy-scale {dname} {sname} {mb}MB (1R+1W)", dt,
                     2 * n * esize)

                def reduce_(x_):
                    def body(c, _):
                        # c enters the product BEFORE the sum, so the sum
                        # cannot be hoisted out of the loop
                        s = jnp.sum((x_ * (1 + c.astype(x_.dtype))
                                     ).astype(jnp.float32))
                        return s * 1e-30, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                        length=ITERS)
                    return c

                dt = timed(reduce_, x)
                emit(f"reduce {dname} {sname} {mb}MB (1R)", dt,
                     n * esize)
    return 0


if __name__ == "__main__":
    sys.exit(main())
