"""Symmetric per-output-channel int8 quantization for decoder WEIGHTS.

Decode ticks are HBM-bandwidth-bound. After the int8/int4 KV-cache modes
(ops/kvquant.py) shrink the cache stream, the decoder's dense weights become
the largest remaining reducible term of the per-tick byte table
(scripts/diag_slot_tick.py: at R=512 / int4 KV, weights are ~28% of the
bytes a tick must move — attn q/k/v/out + ff + the hidden x vocab
projection all stream from HBM once per tick regardless of R). Storing them
as int8 halves that stream.

The scheme is the standard weight-only W8 fold: for a dense ``y = x @ W``
with ``W (in, out)``, quantize per OUTPUT channel::

    s[o]     = max_i |W[i, o]| / 127          (fp32, one scalar per column)
    Wq[i, o] = round(W[i, o] / s[o])          (int8)
    y        = (x @ Wq) * s + b

The scale is constant over the contraction axis, so it factors exactly out
of the dot — the fold is mathematically exact (only fp reassociation
differs from dequantize-then-matmul; tests/test_weight_quant.py pins the
oracle). The int8->compute-dtype cast fuses into the MXU operand read; the
per-column multiply touches only the SMALL (rows, out) result. Nothing
weight-sized materializes at bf16.

This is an OPT-IN serving mode (``decode_weights="int8"`` on the
transformer steppers / ``ContinuousCaptioner`` / ``VCR_DECODE_WEIGHTS``
env): emitted tokens are NOT bit-identical to the bf16-weight path
(~1/254 relative rounding per weight — smaller than the bf16 quantum for
most columns, but a different rounding). It composes orthogonally with the
KV-cache modes (kv_cache="int8"/"int4"). The reference has no serving
path; this corresponds to weight-only-quantized deployment (the W8A16 of
production LLM serving). Accuracy is measured, not assumed — see
tests/test_weight_quant.py (fold oracle, logit envelope, token agreement)
and scripts/eval_kv_quant.py --decode_weights int8 for corpus metrics.

Only DENSE weights quantize. Norm gains/biases, the GloVe embedding gather
(R rows, not a stream of the whole table) and the PE table stay fp32 —
they are byte-trivial and parity-sensitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_QMAX = 127.0


def quantize_dense(p: dict) -> dict:
    """{"w" (..., in, out) f32[, "b"]} -> {"wq" int8, "ws" f32 (..., out)[, "b"]}.

    The reduction runs over the CONTRACTION axis (-2), so a stacked
    layer tree (n_layers, in, out) quantizes to per-(layer, column) scales
    and slicing layer i afterwards equals quantizing the slice. Zero
    columns get scale 0 and codes 0 (dequantize to exact zeros).
    Idempotent at the callers: already-quantized dicts carry "wq".
    """
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2)                   # (..., out)
    scale = amax / _QMAX
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(w * inv[..., None, :]), -_QMAX, _QMAX
                 ).astype(jnp.int8)
    out = {"wq": q, "ws": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dense_q(p: dict, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Quantized-weight dense: (x @ Wq) * s + b, fp32 accumulation.

    Mirrors nn/layers.dense: operands cast to ``compute_dtype`` (the
    int8->cdt convert fuses into the dot's operand read), fp32 accumulate,
    then the exact per-column scale fold and the fp32 bias add.
    """
    y = jnp.dot(x.astype(compute_dtype), p["wq"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    y = y * p["ws"]
    if "b" in p:
        y = y + p["b"]
    return y


def dequantize_dense(p: dict) -> dict:
    """Reference dequantization back to a plain dense param (tests)."""
    out = {"w": p["wq"].astype(jnp.float32) * p["ws"][..., None, :]}
    if "b" in p:
        out["b"] = p["b"]
    return out


def resolve_mode(decode_weights: str | None) -> str:
    """Resolve a decode_weights option ("bf16"/"int8"; None -> the
    VCR_DECODE_WEIGHTS env default, else "bf16")."""
    import os

    dw = decode_weights or os.environ.get("VCR_DECODE_WEIGHTS", "bf16")
    if dw not in ("bf16", "int8"):
        raise ValueError(
            f"decode_weights must be 'bf16' or 'int8', got {dw!r}")
    return dw


# ---- GRU-family decode weights --------------------------------------------
#
# The GRU slot/beam steppers (decode.py) stream their dense weights every
# tick exactly like the transformer's: rnn w_ih/w_hh (3H gate columns) and
# the hidden x vocab projection. Unlike the transformer, the SAME rnn param
# dicts also drive the encoder scans, so quantization here AUGMENTS the
# dict (adds wq_*/ws_* next to the f32 originals) instead of replacing —
# encode paths keep reading the original names, the W8 steppers read only
# the codes, and one tree serves both graphs (live pool and frozen
# artifact). The extra f32 copy is a few MB of weights; the per-tick HBM
# win is the halved code stream.


def augment_gru(p: dict) -> dict:
    """GRU params {"w_ih","w_hh","b_ih","b_hh"} -> same dict plus
    wq_ih/ws_ih/wq_hh/ws_hh int8 codes + per-gate-column scales.
    Idempotent."""
    if "wq_hh" in p:
        return p
    qi = quantize_dense({"w": p["w_ih"]})
    qh = quantize_dense({"w": p["w_hh"]})
    return dict(p, wq_ih=qi["wq"], ws_ih=qi["ws"],
                wq_hh=qh["wq"], ws_hh=qh["ws"])


def augment_dense(p: dict) -> dict:
    """Dense params {"w"[, "b"]} -> same dict plus wq/ws. Idempotent."""
    if "wq" in p:
        return p
    q = quantize_dense(p)
    return dict(p, wq=q["wq"], ws=q["ws"])


def dense_aug(p: dict, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """dense through the augmented dict's int8 codes (see dense_q)."""
    y = jnp.dot(x.astype(compute_dtype), p["wq"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    y = y * p["ws"]
    if "b" in p:
        y = y + p["b"]
    return y


def gru_x_gates(p: dict, x: jax.Array, compute_dtype=jnp.bfloat16):
    """x @ w_ih + b_ih through the int8 codes of an augmented GRU dict."""
    return (jnp.dot(x.astype(compute_dtype), p["wq_ih"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            * p["ws_ih"] + p["b_ih"])


def gru_h_gates(p: dict, h: jax.Array, compute_dtype=jnp.bfloat16):
    """h @ w_hh + b_hh through the int8 codes of an augmented GRU dict —
    passed to nn.rnn.gru_gates as its precomputed ``h_gates``."""
    return (jnp.dot(h.astype(compute_dtype), p["wq_hh"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            * p["ws_hh"] + p["b_hh"])
