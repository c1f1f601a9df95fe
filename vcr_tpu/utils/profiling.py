"""Profiling and tracing hooks.

The reference has no profiling beyond wall-clock prints (SURVEY.md §5). Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable XLA trace (set ``VCR_TRACE_DIR`` or pass a path).
* :class:`StepTimer` — cheap per-step wall-clock stats (EMA + percentiles)
  for the train loop; reported through the logger.
* :func:`annotate` — named trace spans (jax.profiler.TraceAnnotation) for
  host-side phases (data loading, METEOR, checkpointing).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    trace_dir = trace_dir or os.environ.get("VCR_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the profiler timeline (no-op cost when idle)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step statistics with EMA, for steady-state throughput
    visibility without per-step device syncs."""

    def __init__(self, ema: float = 0.05):
        self._ema_w = ema
        self.ema_ms: Optional[float] = None
        self._samples = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) * 1e3
            self._samples.append(dt)
            self.ema_ms = dt if self.ema_ms is None else (
                (1 - self._ema_w) * self.ema_ms + self._ema_w * dt)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._samples:
            return {}
        arr = np.asarray(self._samples)
        return {
            "step_ms_mean": float(arr.mean()),
            "step_ms_p50": float(np.percentile(arr, 50)),
            "step_ms_p95": float(np.percentile(arr, 95)),
            "step_ms_ema": float(self.ema_ms or 0.0),
            "steps": float(len(arr)),
        }

    def reset(self) -> None:
        self._samples = []
        self._last = None
