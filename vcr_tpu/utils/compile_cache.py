"""Persistent XLA compilation cache.

Cold-compiling a train/serving program costs 20-40s on TPU (and every retry
through a flaky link recompiles from scratch). JAX ships a persistent
on-disk compilation cache keyed on (HLO, platform, flags); enabling it makes
every program after the first process-lifetime free across runs, restarts,
and preemption-resume cycles — exactly the production pattern this framework
targets (the reference recompiled its CUDA kernels per process and had no
equivalent).

Two entry points:
  - enable_compile_cache(path): explicit, used by the CLI when
    ``--compile_cache_dir`` is set.
  - maybe_enable_compile_cache(): env-driven (``VCR_COMPILE_CACHE``), called
    by the bench entries so unattended captures opt in without flag plumbing.

Must run before the first compilation; calling it later still works for
subsequent compiles (JAX reads the config at compile time).
"""

from __future__ import annotations

import os
from typing import Optional

_ENV_VAR = "VCR_COMPILE_CACHE"
_enabled_dir: Optional[str] = None


def enable_compile_cache(path: str) -> bool:
    """Point JAX's persistent compilation cache at ``path``.

    Returns True if the cache was enabled (or already enabled at the same
    path). Never raises: an unsupported backend or read-only filesystem
    degrades to normal (uncached) compilation with a warning.
    """
    global _enabled_dir
    if not path:
        return False
    path = os.path.abspath(os.path.expanduser(path))
    if _enabled_dir == path:
        return True
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: the default thresholds (>=1s compile, >="small"
        # executable) skip exactly the tiny probe/eval programs whose
        # re-compiles dominate flaky-link retries.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - depends on jax build
        print(f"[vcr_tpu] compilation cache unavailable ({e}); compiling uncached")
        return False
    _enabled_dir = path
    return True


def maybe_enable_compile_cache() -> bool:
    """Enable the cache iff the ``VCR_COMPILE_CACHE`` env var names a dir."""
    return enable_compile_cache(os.environ.get(_ENV_VAR, ""))
