"""Weight initialization matching the reference's ``ixvr`` scheme.

Reference (utils.py:100-118): Xavier-*normal* weights, constant 0.01 biases, for
every Linear and per-layer RNN weight matrix; BatchNorm and Embedding are skipped
(embeddings keep their GloVe rows). Torch's xavier_normal_ on a (out, in) matrix
uses std = sqrt(2 / (fan_in + fan_out)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIAS_INIT = 0.01


def xavier_normal(key: jax.Array, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype=dtype)


def dense_init(key: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True):
    """Linear layer params. Stored as (in, out) for x @ w (row-major MXU layout).

    Xavier fans follow torch's (out, in) convention: fan_in=in_dim, fan_out=out_dim.
    """
    w = xavier_normal(key, (in_dim, out_dim), in_dim, out_dim)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.full((out_dim,), BIAS_INIT, dtype=jnp.float32)
    return p


def rnn_mat_init(key: jax.Array, in_dim: int, gates_dim: int):
    """One RNN weight matrix, stored (in, gates). Torch shape is (gates, in), so
    xavier fans are fan_in=in_dim, fan_out=gates_dim — matching ixvr's
    xavier_normal_(weight_ih_l0) on the *whole* stacked gate matrix
    (utils.py:107-111)."""
    return xavier_normal(key, (in_dim, gates_dim), in_dim, gates_dim)


def const_bias(dim: int, val: float = BIAS_INIT):
    return jnp.full((dim,), val, dtype=jnp.float32)
