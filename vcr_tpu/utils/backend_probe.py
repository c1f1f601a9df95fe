"""Flake-robust TPU backend probing for the bench/check entry points.

Round-2 post-mortem (VERDICT.md "What's weak" #1): the driver's single shot at
``BENCH_r02.json`` died on the first ``Unable to initialize backend 'axon'``
because the tunnel to the real chip was transiently down and ``bench.py`` made
no attempt to probe or retry.  Worse, a half-dead tunnel does not *error* — it
*hangs*: a ``jnp.ones((8,8))`` matmul simply blocks forever, so an in-process
try/except can never recover.  The probe therefore runs in a **subprocess**
with a hard wall-clock timeout; the parent process never touches jax until a
probe has succeeded, so it cannot be wedged by a dead backend.

Usage (see bench.py / bench_all.py / bench_train.py / tpu_checks.py):

    ok, diag = backend_probe.ensure_backend()
    if not ok:
        backend_probe.emit_failure_json(metric="...", unit="...", diag=diag)
        sys.exit(1)

On success the parent proceeds to initialize jax itself (the tunnel was
reachable moments ago; a race remains possible but is no longer the common
case).  On final failure a structured one-JSON-line failure record is printed
so the driver's BENCH_r{N}.json artifact carries a diagnostic instead of a
bare traceback.

Opt-outs/tuning via env:
  VCR_PROBE_ATTEMPTS (default 3), VCR_PROBE_WAIT_S (default 60),
  VCR_PROBE_TIMEOUT_S (default 240 — first axon compile is ~20-40s; a dead
  tunnel blocks far past this), VCR_SKIP_PROBE=1 skips entirely (CI on CPU).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Tuple

# The probe: smallest op that exercises the full path we bench through —
# backend init, compile, execute, and a host readback (np.asarray forces the
# result through the tunnel; block_until_ready does NOT synchronize through
# axon, see CLAUDE.md).
_PROBE_SRC = """
import time; t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
x = jnp.ones((8, 8), jnp.float32)
y = np.asarray(x @ x)
assert float(y[0, 0]) == 8.0, y[0, 0]
print("PROBE_OK backend=%s ndev=%d dt=%.1fs"
      % (jax.default_backend(), len(jax.devices()), time.time() - t0))
"""


def probe_once(timeout_s: float, env: dict | None = None) -> Tuple[bool, str]:
    """Run one subprocess probe. Returns (ok, diagnostic line).

    env=None inherits the parent environment (the production path: the axon
    sitecustomize registers the TPU backend when PALLAS_AXON_POOL_IPS is set).
    Tests pass a stripped env to probe the CPU backend instead.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s (tunnel hang)"
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return True, r.stdout.strip().splitlines()[-1]
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    return False, "probe rc=%d: %s" % (r.returncode, " | ".join(tail[-3:]))


def ensure_backend(attempts: int | None = None,
                   wait_s: float | None = None,
                   timeout_s: float | None = None,
                   verbose: bool = True) -> Tuple[bool, str]:
    """Probe with bounded retry/backoff. Returns (ok, last diagnostic)."""
    # Honor VCR_COMPILE_CACHE before the parent's first compile (env-gated;
    # jax.config.update does not initialize the backend, so this cannot hang
    # even when the tunnel is dead).
    from vcr_tpu.utils.compile_cache import maybe_enable_compile_cache

    maybe_enable_compile_cache()
    if os.environ.get("VCR_SKIP_PROBE") == "1":
        return True, "probe skipped (VCR_SKIP_PROBE=1)"
    attempts = attempts or int(os.environ.get("VCR_PROBE_ATTEMPTS", "3"))
    wait_s = wait_s if wait_s is not None else float(
        os.environ.get("VCR_PROBE_WAIT_S", "60"))
    timeout_s = timeout_s or float(os.environ.get("VCR_PROBE_TIMEOUT_S", "240"))

    diag = "no attempts made"
    for i in range(attempts):
        ok, diag = probe_once(timeout_s)
        if verbose:
            print(f"[backend_probe] attempt {i + 1}/{attempts}: {diag}",
                  file=sys.stderr)
        if ok:
            return True, diag
        if i + 1 < attempts:
            time.sleep(wait_s)
    return False, diag


def emit_failure_json(metric: str, unit: str, diag: str) -> None:
    """One structured JSON line the driver can archive instead of a traceback."""
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": unit,
        "vs_baseline": None,
        "error": "TPU backend unavailable after probe retries",
        "diagnostic": diag[:500],
    }))
