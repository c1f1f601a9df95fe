"""Core functional layers: dense, embedding, dropout, torch-style LayerNorm,
conv2d and batchnorm.

All matmuls run through :func:`vdot`, which casts operands to the configured
compute dtype (bfloat16 by default → MXU full rate) while accumulating in
float32 (``preferred_element_type``), and parameters are always stored float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vcr_tpu.nn import init as vinit


def vdot(x: jax.Array, w: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """x @ w with operands cast to `compute_dtype`, fp32 accumulation."""
    return jnp.dot(
        x.astype(compute_dtype), w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


# ---------------- dense ----------------

def dense_init(key, in_dim, out_dim, use_bias=True):
    return vinit.dense_init(key, in_dim, out_dim, use_bias)


def dense(params, x, compute_dtype=jnp.bfloat16):
    y = vdot(x, params["w"], compute_dtype)
    if "b" in params:
        y = y + params["b"]
    return y


# ---------------- embedding ----------------

def embedding_init(vectors: jnp.ndarray, padded_size: int | None = None):
    """GloVe-initialized embedding table (reference: S2VTModel.py:37-40 — the
    ixvr pass skips Embedding so the GloVe rows survive, utils.py:101-103).
    Optionally zero-pad the vocab axis to ``padded_size`` (MXU/mp alignment)."""
    table = jnp.asarray(vectors, dtype=jnp.float32)
    if padded_size is not None and padded_size > table.shape[0]:
        pad = jnp.zeros((padded_size - table.shape[0], table.shape[1]), jnp.float32)
        table = jnp.concatenate([table, pad], axis=0)
    return {"table": table}


def embed(params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["table"], ids, axis=0)


def mask_vocab_pad(logits: jax.Array, vocab_size: int) -> jax.Array:
    """Force padded vocab columns to -1e9 so they never win argmax and carry
    ~zero softmax mass (keeps CE equal to the unpadded model)."""
    if logits.shape[-1] == vocab_size:
        return logits
    invalid = jnp.arange(logits.shape[-1]) >= vocab_size
    return jnp.where(invalid, -1e9, logits)


# ---------------- dropout ----------------

def dropout(key: Optional[jax.Array], x: jax.Array, rate: float, train: bool) -> jax.Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------- torch-style LayerNorm ----------------

def norm_init(dim: int):
    return {"alpha": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def torch_norm(params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """The reference Transformer's hand-rolled Norm (model/TransformerNet.py:91-106):
    alpha * (x - mean) / (std + eps) + bias, where std is the *unbiased*
    (Bessel-corrected) std, as torch's Tensor.std defaults to. Replicated exactly
    for checkpoint/decode parity — do not "fix" to rsqrt(var + eps).

    Dtype-preserving: internals always run in float32 (mean/var of a bf16
    stream would lose the quantum), the result is cast back to x.dtype. For
    float32 input both casts are no-ops — bitwise identical to the original
    formulation — which keeps every f32 parity path untouched while letting
    the train-time bf16 residual stream (models/transformer.py) flow through
    without silently promoting back to f32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((x32 - mean) ** 2, axis=-1, keepdims=True) / (n - 1)
    std = jnp.sqrt(var)
    out = params["alpha"] * (x32 - mean) / (std + eps) + params["bias"]
    return out.astype(x.dtype)


# ---------------- conv2d (NCHW, torch layout) + batchnorm ----------------

def conv2d_init(key, in_ch, out_ch, ksize, use_bias=True):
    """Torch Conv2d weight layout (O, I, kH, kW); ixvr xavier fans follow torch:
    fan_in = I*kH*kW, fan_out = O*kH*kW (utils.py:112-116 applies to .weight)."""
    fan_in = in_ch * ksize * ksize
    fan_out = out_ch * ksize * ksize
    w = vinit.xavier_normal(key, (out_ch, in_ch, ksize, ksize), fan_in, fan_out)
    p = {"w": w}
    if use_bias:
        p["b"] = vinit.const_bias(out_ch)
    return p


def conv2d(params, x, stride=1, padding="SAME", compute_dtype=jnp.bfloat16):
    """x: (B, C, H, W) NCHW to match the reference's torch tensors.

    The output dtype equals compute_dtype (upcast to f32 by the bias add):
    requesting preferred_element_type=f32 on bf16 operands makes the conv VJP
    mix f32 cotangents with bf16 weights, which lax.conv rejects. TPU convs
    accumulate in f32 internally either way."""
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = y.astype(jnp.float32)
    if "b" in params:
        y = y + params["b"][None, :, None, None]
    return y


def batchnorm_init(ch: int):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def batchnorm(params, x, train: bool, eps: float = 1e-5, momentum: float = 0.1):
    """BatchNorm2d over NCHW. Returns (y, new_params) — running stats are data,
    threaded functionally instead of mutated in place."""
    if train:
        axes = (0, 2, 3)
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new = dict(params)
        new["mean"] = (1 - momentum) * params["mean"] + momentum * mean
        new["var"] = (1 - momentum) * params["var"] + momentum * unbiased
    else:
        mean, var = params["mean"], params["var"]
        new = params
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None, None]) * (inv * params["scale"])[None, :, None, None]
    return y + params["bias"][None, :, None, None], new
