"""Persistent XLA compilation cache (vcr_tpu/utils/compile_cache.py).

Runs the cache in subprocesses so the suite's own jax config is untouched:
run 1 populates the on-disk cache, run 2 compiles the same program and must
hit it (no new entries), a different program adds an entry.
"""

import os
import subprocess
import sys

from vcr_tpu.utils.compile_cache import maybe_enable_compile_cache, enable_compile_cache

_RUN = """
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import jax.numpy as jnp
from vcr_tpu.utils.compile_cache import maybe_enable_compile_cache
assert maybe_enable_compile_cache()
n = int(sys.argv[1])
f = jax.jit(lambda x: x @ x + 2.0)
y = f(jnp.ones((n, n), jnp.float32))
assert float(y[0, 0]) == n + 2.0
print("RUN_OK")
"""


def _run(cache_dir, n):
    env = dict(os.environ, JAX_PLATFORMS="cpu", VCR_COMPILE_CACHE=cache_dir)
    r = subprocess.run([sys.executable, "-c", _RUN, str(n)],
                       capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0 and "RUN_OK" in r.stdout, (r.stdout, r.stderr)
    return set(os.listdir(cache_dir))


def test_cache_populates_persists_and_hits(tmp_path):
    cache = str(tmp_path / "xla_cache")
    first = _run(cache, 16)
    assert first, "first run wrote no cache entries"
    second = _run(cache, 16)
    assert second == first, "identical program should hit, not re-add"
    third = _run(cache, 32)
    assert third > first, "new program shape should add an entry"


def test_disabled_without_env_or_flag(monkeypatch):
    monkeypatch.delenv("VCR_COMPILE_CACHE", raising=False)
    assert maybe_enable_compile_cache() is False
    assert enable_compile_cache("") is False
