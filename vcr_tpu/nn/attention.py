"""Attention primitives: Bahdanau additive attention and multi-head attention.

Replicates the reference math exactly:
* Temporal Bahdanau attention (reference: model/S2VTAttModel.py:12-48) —
  energy = v^T tanh(W_q q + W_k k), softmax over frames, *deliberately unmasked*
  ("we assume all the frames are valid", S2VTAttModel.py:42) — replicated, not
  fixed, to preserve metric parity.
* Spatial variant returning (context, alphas), with context computed against the
  raw features and the key projection applied inside (model/SpatialNet.py:14-53).
* Scaled-dot-product MHA with the reference Transformer's width quirks
  (model/TransformerNet.py:14-73): q/k/v project from the *raw* encoder (4096) /
  decoder (300) widths to hidden, and the output projects back to the raw width.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.nn.layers import dense, dense_init, dropout


# ---------------- Bahdanau (additive) attention ----------------

def bahdanau_init(key: jax.Array, hidden_size: int):
    kq, kk, ke = jax.random.split(key, 3)
    return {
        "key_layer": dense_init(kk, hidden_size, hidden_size, use_bias=False),
        "query_layer": dense_init(kq, hidden_size, hidden_size, use_bias=False),
        "energy_layer": dense_init(ke, hidden_size, 1, use_bias=False),
    }


def bahdanau_project_keys(params, keys: jax.Array, compute_dtype=jnp.bfloat16):
    """Precompute W_k·keys once per sequence (reference: S2VTAttModel.py:178)."""
    return dense(params["key_layer"], keys, compute_dtype)


def bahdanau_attend(
    params,
    query: jax.Array,       # (B, H) decoder/encoder hidden state
    proj_key: jax.Array,    # (B, N, H) projected keys
    values: jax.Array,      # (B, N, D) attended values (H for temporal, F for spatial)
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (context (B, D), alphas (B, N)). No masking — parity with the
    reference's all-frames-valid assumption."""
    q = dense(params["query_layer"], query, compute_dtype)          # (B, H)
    energy = jnp.tanh(q[:, None, :] + proj_key)                      # (B, N, H)
    scores = dense(params["energy_layer"], energy, compute_dtype)[..., 0]  # (B, N)
    alphas = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum(
        "bn,bnd->bd",
        alphas.astype(compute_dtype), values.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return context, alphas


# ---------------- Multi-head attention (reference Transformer widths) ----------------

def mha_init(key: jax.Array, heads: int, hidden_size: int, flag: str,
             e_width: int = 4096, d_width: int = 300):
    """flag: 'e' (encoder, raw feature width), 'd' (decoder, GloVe width),
    'ed' (cross: q from decoder width, k/v from encoder width) —
    model/TransformerNet.py:21-34. The reference hard-codes 4096/300 (its only
    config); here the widths follow the model spec and default to the same."""
    if flag == "e":
        q_in = k_in = v_in = e_width
    elif flag == "d":
        q_in = k_in = v_in = d_width
    elif flag == "ed":
        q_in, v_in, k_in = d_width, e_width, e_width
    else:
        raise NotImplementedError(flag)
    del heads  # head count is a static apply-time arg (params hold arrays only,
    #            so layer stacks can be lax.scan-ned)
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": dense_init(kq, q_in, hidden_size),
        "k": dense_init(kk, k_in, hidden_size),
        "v": dense_init(kv, v_in, hidden_size),
        "out": dense_init(ko, hidden_size, q_in),
    }


def mha_apply(
    params,
    heads: int,
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: Optional[jax.Array] = None,          # broadcastable to (B, 1, Lq, Lk); 0 = masked
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
    train: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    hidden = params["q"]["w"].shape[1]
    d_k = hidden // heads
    b = q.shape[0]

    def split_heads(x):
        return x.reshape(b, -1, heads, d_k).transpose(0, 2, 1, 3)  # (B, h, L, d_k)

    qh = split_heads(dense(params["q"], q, compute_dtype))
    kh = split_heads(dense(params["k"], k, compute_dtype))
    vh = split_heads(dense(params["v"], v, compute_dtype))

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        qh.astype(compute_dtype), kh.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) / (d_k ** 0.5)
    if mask is not None:
        # reference: scores.masked_fill(mask == 0, -1e9) (TransformerNet.py:64-66)
        scores = jnp.where(mask == 0, -1e9, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = dropout(dropout_key, attn, dropout_rate, train)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd",
        attn.astype(compute_dtype), vh.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    concat = ctx.transpose(0, 2, 1, 3).reshape(b, -1, hidden)
    return dense(params["out"], concat, compute_dtype)
