"""Symmetric per-vector int8 quantization for attention K/V caches.

Decode ticks are HBM-bandwidth-bound: the transformer slot stepper reads its
whole self-attention cache (R,h,L,d) plus the cross-attention K/V (R,h,N,d)
every tick (onchip_r4/diag_slot_tick.log — the nowrite floor is pure cache
reads). Storing those caches as int8 with one bf16 scale per (row, head,
position) vector halves the dominant byte stream, and the dequantization
never materializes in HBM because both uses fold into score-side tensors:

  * K: ``scores = (q · K_q) * s_k``   — the int8→bf16 convert fuses into the
    MXU dot's operand read; the per-position scale multiplies the SMALL
    (…, L) score tensor afterwards.
  * V: ``ctx = (w * s_v) · V_q``      — fold the scale into the attention
    weights (also (…, L)) before the dot.

Quantization is symmetric round-to-nearest per vector of d values:
``scale = max|v| / 127``, ``q = round(v / scale)``. A zero vector gets
scale 0 and dequantizes to exact zeros (the uninitialized-cache case), so
masked positions stay harmless.

This is an OPT-IN serving mode (``ContinuousCaptioner(kv_cache="int8")`` /
``VCR_KV_CACHE=int8``): emitted tokens are NOT bit-identical to the bf16
cache path (quantization error ~1/127 relative per vector). The reference
has no serving path at all; this corresponds to the vLLM-style quantized-KV
deployment option. Accuracy impact is measured, not assumed — see
tests/test_kv_quant.py (logit-envelope + token-agreement) and
scripts/eval_kv_quant.py (corpus METEOR/BLEU A/B).

Determinism contract (r4c on-chip finding, onchip_r4/tpu_checks.log): one
COMPILED PROGRAM is deterministic, but two different programs that both
call ``quantize`` — e.g. the masked vs scatter cache-write forms — are NOT
guaranteed bit-equal on TPU: XLA fuses the amax / ``1/scale`` / ``round``
arithmetic differently per fusion context, which can flip a code on an
exact rounding tie. Eager (CPU) the two forms ARE bitwise equal
(tests/test_kv_quant.py); compiled, tpu_checks bounds their logit gap
instead. Same lesson as the lineage-beam numerics: only identical ops on
identical operands give bit identity, and fusion context changes the ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# int8 symmetric range. 127 (not 128) keeps the codebook symmetric so that
# round(v/scale) can never overflow to -128 spuriously. int4 likewise uses
# +/-7 (not -8) for a symmetric codebook.
_QMAX = 127.0

# kv_cache mode -> (qmax, code dtype). int4 codes use the native jnp.int4
# storage type (XLA packs s4 two-per-byte on TPU), quartering the bf16
# cache byte stream at ~16x the int8 per-element quantization error —
# the coarser codebook rides the SAME per-(row, head, position) scales,
# so error stays bounded per vector. Opt-in, experimental: measure with
# scripts/eval_kv_quant.py before serving with it.
_MODES = {
    "int8": (127.0, jnp.int8),
    "int4": (7.0, jnp.int4),
}


def mode_params(kv_cache: str):
    """-> (qmax, code dtype) for a quantized kv_cache mode name."""
    return _MODES[kv_cache]


def quantize(v: jax.Array, axis: int = -1, qmax: float = _QMAX,
             qdtype=jnp.int8):
    """Per-vector symmetric integer quantization along ``axis``.

    Returns ``(q qdtype, scale)`` with ``scale`` shaped like ``v`` with
    ``axis`` reduced to 1 (broadcast-ready), dtype float32 — the scale
    joins small score-side tensors, so fp32 costs nothing and avoids a
    second rounding.
    """
    amax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = amax / qmax
    # guard the all-zero vector: q = 0, scale = 0 -> dequant exact zeros
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.round(v.astype(jnp.float32) * inv)
    q = jnp.clip(q, -qmax, qmax).astype(qdtype)
    return q, scale


def dequantize(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Reference dequantization (tests / non-fused paths)."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


def fold_k(scores_q: jax.Array, scale_k: jax.Array) -> jax.Array:
    """Apply the K-side scales AFTER the q·K_q dot.

    ``scores_q``: (..., L) dot of queries with the int8 codes (cast to the
    compute dtype inside the dot). ``scale_k``: broadcastable (..., L) —
    the per-position quantization scales, squeezed from quantize()'s
    keepdims form by the caller's layout.
    """
    return scores_q * scale_k


def fold_v(weights: jax.Array, scale_v: jax.Array) -> jax.Array:
    """Fold the V-side scales into the attention weights BEFORE the w·V_q
    dot (both are (..., L) tensors — nothing cache-sized materializes)."""
    return weights * scale_v
