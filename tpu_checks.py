"""Compiled-mode (non-interpret) Pallas kernel parity on REAL TPU hardware.

The pytest suite runs on a virtual CPU mesh where the kernels auto-fall-back
to interpret mode (ops/pallas_gru._resolved_interpret); this script is the
compiled-mode counterpart, run manually or by CI on a machine with a TPU:

    python tpu_checks.py

Checks every kernel (GRU fwd, GRU grad, LSTM both directions, BiLSTM) against
the pure-JAX scan at fp32 and exits nonzero on any mismatch.
"""

import sys

from vcr_tpu.utils import backend_probe

# Probe before importing jax: a dead axon tunnel hangs on first device use
# (VERDICT.md round-2 post-mortem), so fail fast with a diagnostic instead.
_ok, _diag = backend_probe.ensure_backend()
if not _ok:
    print(f"TPU backend unavailable after retries: {_diag}", file=sys.stderr)
    sys.exit(2)

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.nn import rnn
from vcr_tpu.ops import pallas_gru as pg


def check(name, got, want, atol=5e-4, rtol=2e-3):
    """TPU fp32 matmuls run in bf16-ish passes by default, and the pallas
    kernel's in-kernel dot and XLA's scan matmul round differently — ~1e-4
    absolute differences are hardware-expected (CLAUDE.md: fp32-exact parity
    checks must run on CPU). These tolerances catch real math errors (gate
    order, indexing, tiling) without tripping on precision."""
    got, want = np.asarray(got), np.asarray(want)
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{'PASS' if ok else 'FAIL'}  {name}  maxdiff={np.abs(got - want).max():.2e}")
    return ok


def main() -> int:
    if jax.default_backend() != "tpu":
        print(f"not on TPU (backend={jax.default_backend()}) — kernels would "
              "run in interpret mode; nothing to check here")
        return 0
    rng = np.random.default_rng(0)
    t, b, i, h = 12, 256, 64, 512
    ok = True

    gp = rnn.gru_init(jax.random.PRNGKey(0), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)), jnp.float32)
    ref = rnn.gru_sequence(gp, xs, compute_dtype=jnp.float32)
    got = jax.jit(lambda p, x: pg.gru_sequence_pallas(
        p, x, compute_dtype=jnp.float32))(gp, xs)
    ok &= check("gru fwd outs", got[0], ref[0])
    ok &= check("gru fwd h_last", got[1], ref[1])

    g_pal = jax.jit(jax.grad(lambda p, x: jnp.sum(pg.gru_sequence_pallas(
        p, x, compute_dtype=jnp.float32)[0] ** 2)))(gp, xs)
    g_ref = jax.jit(jax.grad(lambda p, x: jnp.sum(rnn.gru_sequence(
        p, x, compute_dtype=jnp.float32)[0] ** 2)))(gp, xs)
    for k in g_ref:
        ok &= check(f"gru grad {k}", g_pal[k], g_ref[k], atol=5e-2, rtol=5e-3)

    lp = rnn.lstm_init(jax.random.PRNGKey(1), i, h)
    for rev in (False, True):
        r_outs, (r_h, r_c) = rnn.lstm_sequence(lp, xs, reverse=rev,
                                               compute_dtype=jnp.float32)
        p_outs, (p_h, p_c) = jax.jit(lambda p, x, rv=rev: pg.lstm_sequence_pallas(
            p, x, reverse=rv, compute_dtype=jnp.float32))(lp, xs)
        ok &= check(f"lstm rev={rev} outs", p_outs, r_outs)
        ok &= check(f"lstm rev={rev} c_last", p_c, r_c)

    bp = rnn.bilstm_init(jax.random.PRNGKey(2), i, h)
    ok &= check("bilstm outs",
                jax.jit(lambda p, x: pg.bilstm_sequence_pallas(
                    p, x, compute_dtype=jnp.float32))(bp, xs),
                rnn.bilstm_sequence(bp, xs, compute_dtype=jnp.float32))

    print("ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
