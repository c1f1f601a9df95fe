"""Gumbel-Softmax with straight-through hard sampling.

Matches torch.nn.functional.gumbel_softmax semantics used by the reference
RationaleNet generator (model/RationaleNet.py:49-50): soft samples during
training, hard (one-hot, straight-through) samples at eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Equivalence-harness hook (scripts/run_equivalence.py, same pattern as
# transformer.INTERNAL_DROPOUT): True replaces the sampled Gumbel noise with
# zeros so a whole run is deterministic and comparable against the reference
# with torch.nn.functional.gumbel_softmax patched to its zero-noise form —
# cross-framework noise streams cannot be seed-matched (PARITY.md), and the
# stochastic per-step math is proven separately by injecting IDENTICAL drawn
# noise into both frameworks (tests/test_train_equivalence.py).
ZERO_NOISE = False


def gumbel_softmax(
    key: jax.Array,
    logits: jax.Array,
    tau: float = 1.0,
    hard: bool = False,
    axis: int = -1,
    noise: jax.Array | None = None,
) -> jax.Array:
    """Sample from the Gumbel-Softmax distribution.

    soft: y = softmax((logits + g) / tau), g ~ Gumbel(0, 1)
    hard: one_hot(argmax(y)) with straight-through gradients
          (y_hard - stop_grad(y) + y), as in torch.

    ``noise`` injects pre-drawn Gumbel(0,1) noise instead of sampling from
    ``key`` — used by cross-framework parity tests to share noise with torch.
    """
    if noise is not None:
        gumbels = noise
    elif ZERO_NOISE:
        gumbels = jnp.zeros_like(logits)
    else:
        gumbels = -jnp.log(-jnp.log(
            jax.random.uniform(key, logits.shape, minval=1e-20, maxval=1.0)
        ) + 1e-20)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(idx, logits.shape[axis], axis=axis, dtype=y_soft.dtype)
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
