"""Benchmark helpers: FLOP counting and MFU math.

MFU (model FLOPs utilization) = matmul/conv FLOPs / wall-time / chip peak.
The FLOP count comes from walking the program's jaxpr (`jaxpr_flops`),
multiplying `lax.scan` bodies by their trip count — XLA's own
`compiled.cost_analysis()` counts while-loop bodies ONCE (verified on this
backend: a 10-step scan of 1024³ matmuls reports 1× the body flops), which
makes it useless for the recurrent programs benchmarked here. Only
dot_general and conv_general_dilated are counted, per the usual MFU
convention (elementwise/gather work rides along for free on the VPU).
"""

from __future__ import annotations

import json
import os
from typing import Optional


def emit_row(row: dict) -> None:
    """Print one bench JSON line, tagging the metric with $VCR_BENCH_TAG.

    Capture scripts set VCR_BENCH_TAG for A/B-variant invocations (e.g.
    "gate-remat", "f32-stream") so variant rows carry a DISTINCT metric
    string — compare_rounds.py keys on the metric and keeps the last
    occurrence, so an untagged variant would silently replace the product
    row in the cross-round report (VERDICT r4 weak #3)."""
    tag = os.environ.get("VCR_BENCH_TAG")
    if tag and "metric" in row:
        row = {**row, "metric": f'{row["metric"]} [{tag}]'}
    print(json.dumps(row), flush=True)

# Peak dense bf16 FLOP/s per chip, from published TPU specs.
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e: 197 TFLOP/s bf16
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e (Trillium)
    "TPU v6e": 918e12,
}


def peak_bf16_flops(device) -> Optional[float]:
    """Peak bf16 FLOP/s for `device`, or None if unknown (e.g. CPU)."""
    kind = getattr(device, "device_kind", "")
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name):
            return peak
    return None


def _prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= float(x)
    return out


def _dot_general_flops(eqn) -> float:
    (lc, rc), (lb, _rb) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    batch = _prod(lhs[d] for d in lb)
    contract = _prod(lhs[d] for d in lc)
    lhs_free = _prod(lhs[d] for d in range(len(lhs)) if d not in set(lc) | set(lb))
    rhs_free = _prod(
        rhs[d] for d in range(len(rhs))
        if d not in set(rc) | set(eqn.params["dimension_numbers"][1][1]))
    return 2.0 * batch * contract * lhs_free * rhs_free


def _conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    # rhs_spec = (out_ch, in_ch/groups, *spatial) axis indices
    rhs_in_ch = rhs[dn.rhs_spec[1]]
    kernel_spatial = _prod(rhs[d] for d in dn.rhs_spec[2:])
    return 2.0 * _prod(out) * kernel_spatial * rhs_in_ch


def _jaxpr_flops(jaxpr) -> float:
    """Matmul+conv FLOPs of a (open) jaxpr, recursing into control flow."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # Trip count is data-dependent; count the body once (lower bound).
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"])
        elif name == "pallas_call":
            # Kernel body runs once per grid point.
            grid = 1.0
            gm = eqn.params.get("grid_mapping")
            if gm is not None:
                grid = _prod(d for d in gm.grid if isinstance(d, int))
            total += grid * _jaxpr_flops(eqn.params["jaxpr"])
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def jaxpr_flops(fn, *args, **kwargs) -> Optional[float]:
    """Total matmul/conv FLOPs of one call `fn(*args)` (trace-time count;
    scan bodies multiplied by trip count). None if tracing fails (e.g. a
    pallas_call whose in-kernel matmuls this walker can't see — count those
    via an arithmetic-identical non-pallas spec instead)."""
    import jax

    try:
        closed = jax.make_jaxpr(fn)(*args, **kwargs)
        return _jaxpr_flops(closed.jaxpr)
    except Exception:
        return None


def _jaxpr_gather_bytes(jaxpr) -> float:
    """Bytes PRODUCED by gather ops in a (open) jaxpr, recursing into control
    flow (scan bodies multiplied by trip count). Each gathered byte is also a
    byte read from the source, so the HBM traffic a gather costs is ~2x this.
    Used to quantify beam-reorder traffic (VERDICT r2 #5): a physical KV-cache
    reorder is one big axis-0 gather per cache leaf per step."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "gather":
            out = eqn.outvars[0].aval
            total += _prod(out.shape) * out.dtype.itemsize
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_gather_bytes(
                eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            total += _jaxpr_gather_bytes(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(_jaxpr_gather_bytes(b.jaxpr)
                         for b in eqn.params["branches"])
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += _jaxpr_gather_bytes(getattr(sub, "jaxpr", sub))
                    break
    return total


def jaxpr_gather_bytes(fn, *args, **kwargs) -> Optional[float]:
    """Bytes produced by gathers in one call `fn(*args)` (trace-time count).
    Accepts jax.ShapeDtypeStruct args — nothing is materialized. None if
    tracing fails."""
    import jax

    try:
        closed = jax.make_jaxpr(fn)(*args, **kwargs)
        return _jaxpr_gather_bytes(closed.jaxpr)
    except Exception:
        return None


def mfu(flops_total: Optional[float], seconds: float, device) -> Optional[float]:
    """flops_total/seconds as a fraction of the chip's peak bf16 rate."""
    peak = peak_bf16_flops(device)
    if flops_total is None or peak is None or seconds <= 0:
        return None
    return flops_total / seconds / peak


def chunked_device_put(arr, limit_mb: Optional[float] = None):
    """device_put in row slices of <= limit_mb (default from env
    VCR_UPLOAD_CHUNK_MB; 0/unset = one shot). Bounds each host->device
    request — the session's device tunnel 413-rejects very large single
    transfers, and bounded DMAs pipeline better on real hosts too. Returns
    the same logical device array either way."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    arr = np.asarray(arr)
    if limit_mb is None:
        limit_mb = float(os.environ.get("VCR_UPLOAD_CHUNK_MB", "0"))
    if not limit_mb or arr.nbytes <= limit_mb * 1e6 or arr.ndim == 0:
        return jax.device_put(arr)
    rows_per = max(1, int(limit_mb * 1e6 // max(arr[:1].nbytes, 1)))
    return jnp.concatenate([jax.device_put(arr[i:i + rows_per])
                            for i in range(0, arr.shape[0], rows_per)], axis=0)


def time_chained(run_n, args, device, reps: int = 2):
    """The repo's one benchmark timing discipline (CLAUDE.md): the measured
    fn must already chain its iterations ON DEVICE inside one jit (dispatch
    through the tunnel costs ~24ms, so per-iteration host loops measure the
    tunnel). Compiles+warms once, takes the min over ``reps`` timed calls,
    and returns (seconds, flops, mfu) with flops from the jaxpr walker
    (XLA's cost model counts scan bodies once).  mfu/flops may be None."""
    import time

    import numpy as np

    np.asarray(run_n(*args))  # compile + warm
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_n(*args))
        dt = min(dt, time.perf_counter() - t0)
    flops = jaxpr_flops(run_n, *args)
    return dt, flops, mfu(flops, dt, device)
