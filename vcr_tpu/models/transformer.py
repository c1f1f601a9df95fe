"""Transformer captioner — exact-parity rebuild of reference model/TransformerNet.py.

The reference is a tutorial-style pre-norm encoder-decoder with several quirks
that define its actual behavior and MUST be replicated for checkpoint/decode
parity (SURVEY.md §7 "hard parts"):

* The encoder operates at the RAW feature width (4096) and the decoder at the
  GloVe width (300); MultiHeadAttention projects raw->hidden(512)->raw and
  FeedForward is raw<->2048 (TransformerNet.py:21-34, 79-85).
* ``Norm`` is a hand-rolled LayerNorm with *unbiased* std (TransformerNet.py:104-106).
* PositionalEncoder scales by sqrt(seq_len) — x.shape[1] — NOT sqrt(d_model)
  (TransformerNet.py:129), and its cos channel uses exponent 2(i+1)/d
  (TransformerNet.py:118-121).
* Training feeds the UNSHIFTED target sentence to the decoder (no <sos> prepend
  in the training branch, TransformerNet.py:233-243) — replicated, not fixed.
* Greedy decode re-runs the full decoder stack on the growing prefix each step
  (TransformerNet.py:246-263). Because the sqrt(i) PE scale changes ALL prefix
  embeddings every step, a KV cache would NOT be math-equivalent — so the
  parity decode is a lax.scan over steps running the full (padded, causally
  masked) stack, entirely on device.
* Internal dropouts are the hard-coded 0.1 (not opts.dropout_p); only
  pred_linear uses dropout_p (TransformerNet.py:15, 76, 137, 155, 222).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.models import base
from vcr_tpu.nn.attention import mha_apply, mha_init
from vcr_tpu.nn.layers import (dense, dense_init, dropout, embed, embedding_init,
                               mask_vocab_pad, norm_init, torch_norm)

INTERNAL_DROPOUT = 0.1  # TransformerNet.py hard-codes 0.1 everywhere
D_FF = 2048


def _width(flag: str, spec: base.ModelSpec) -> int:
    """Encoder layers run at the raw feature width, decoder layers at the
    GloVe width. The reference hard-codes these as 4096/300
    (TransformerNet.py:21-29) — the literals equal its only config's
    vid_feat_size/embed_size, so deriving them from the spec is parity-exact
    at the reference dims and additionally generalizes to other feature sets
    (e.g. 512-d resnet feats, which would crash the reference)."""
    return spec.vid_feat_size if flag == "e" else spec.embed_size


def make_positional_encoding(d_model: int, max_seq_len: int = 80) -> np.ndarray:
    """Reference PE table (TransformerNet.py:115-123), including the 2(i+1)/d
    exponent on the cos channel."""
    pe = np.zeros((max_seq_len, d_model), dtype=np.float32)
    for pos in range(max_seq_len):
        for i in range(0, d_model, 2):
            pe[pos, i] = math.sin(pos / (10000 ** ((2 * i) / d_model)))
            if i + 1 < d_model:  # odd widths: the last sin has no cos partner
                pe[pos, i + 1] = math.cos(
                    pos / (10000 ** ((2 * (i + 1)) / d_model)))
    return pe


def _ff_init(key, flag: str, spec):
    k1, k2 = jax.random.split(key)
    size = _width(flag, spec)
    return {"linear_1": dense_init(k1, size, D_FF), "linear_2": dense_init(k2, D_FF, size)}


def _ff_apply(params, x, key, train, cdtype):
    h = jax.nn.relu(dense(params["linear_1"], x, cdtype))
    h = dropout(key, h, INTERNAL_DROPOUT, train)
    return dense(params["linear_2"], h, cdtype)


# OPT-IN selective ff rematerialization (VCR_TF_FF_REMAT=1): jax.checkpoint
# around just the ff block recomputes its saved residuals — the per-layer
# (B, N, d_ff) relu output + dropout mask — in the backward from the
# LayerNorm'd input (explicit dropout keys, so the recompute is bit-exact;
# the whole train step is BITWISE identical either way,
# tests/test_ff_remat.py). On-chip A/B (bench_train_tf_remat.log): it cuts
# per-layer activation memory but measures 2-5% SLOWER (the step is
# bandwidth-bound and the recompute re-reads its inputs), and B=512 still
# exceeds HBM because the dominant stacks are the 4096-wide residual-stream
# saves, not the ff's — so plain autodiff is the default and the remat is
# the memory-pressure escape hatch. (Whole-forward remat — `--remat` — was
# 18% slower: same log.)
_ff_train = jax.checkpoint(
    lambda params, x, key, cdtype_name: _ff_apply(
        params, x, key, True, jnp.dtype(cdtype_name)),
    static_argnums=(3,))


def _ff_block(params, x, key, train, cdtype):
    """ff with opt-in selective rematerialization at train (see _ff_train)."""
    if train and os.environ.get("VCR_TF_FF_REMAT") == "1":
        return _ff_train(params, x, key, jnp.dtype(cdtype).name)
    return _ff_apply(params, x, key, train, cdtype)


# --- train-time residual-stream dtype (VCR_TF_F32_STREAM=1 restores f32) ---
#
# The reference trains everything in f32. Under compute_dtype=bfloat16 this
# package casts matmul OPERANDS to bf16 (nn/layers.vdot) but historically let
# the residual stream itself ride in f32 — so the layer-scan backward stacked
# per-layer f32 saves: six f32 (layers, B, 30, 4096) encoder-stream stacks =
# 8.4 GiB at B=512, the exact allocations in the round-4 OOM dump
# (onchip_r4/bench_train_tf_remat.log; reproduced locally by
# scripts/diag_tf_saves.py). Standard TPU mixed precision keeps the stream in
# bf16: at train, when compute_dtype != float32, the stream is cast to the
# compute dtype after the positional encoding and every residual add stays in
# it (torch_norm computes its mean/var in f32 internally and casts back).
# Norms are additionally rematerialized (jax.checkpoint) so their backward
# recomputes (x - mean)/std from the bf16 carry instead of stacking full-width
# f32 intermediates. f32 compute (every parity/lockstep test) is bitwise
# untouched: the casts are no-ops and the checkpoint wrapper is only applied
# to non-f32 streams.
_norm_remat = jax.checkpoint(torch_norm)


def _stream_cast(x, train, cdtype):
    if train and jnp.dtype(cdtype) != jnp.float32 \
            and os.environ.get("VCR_TF_F32_STREAM") != "1":
        return x.astype(cdtype)
    return x


def _norm(params, x, train):
    if train and x.dtype != jnp.float32:
        return _norm_remat(params, x)
    return torch_norm(params, x)


def _encoder_layer_init(key, heads, hidden, flag, spec):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm_1": norm_init(_width(flag, spec)),
        "norm_2": norm_init(_width(flag, spec)),
        "attn": mha_init(k1, heads, hidden, flag,
                         e_width=spec.vid_feat_size, d_width=spec.embed_size),
        "ff": _ff_init(k2, flag, spec),
    }


def _encoder_layer(params, x, mask, key, heads, train, cdtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x2 = _norm(params["norm_1"], x, train)
    x = x + dropout(k1, mha_apply(params["attn"], heads, x2, x2, x2, mask,
                                  dropout_key=k2, dropout_rate=INTERNAL_DROPOUT,
                                  train=train, compute_dtype=cdtype),
                    INTERNAL_DROPOUT, train).astype(x.dtype)
    x2 = _norm(params["norm_2"], x, train)
    x = x + dropout(k3, _ff_block(params["ff"], x2, k4, train, cdtype),
                    INTERNAL_DROPOUT, train).astype(x.dtype)
    return x


def _decoder_layer_init(key, heads, hidden, flag, spec):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm_1": norm_init(_width(flag, spec)),
        "norm_2": norm_init(_width(flag, spec)),
        "norm_3": norm_init(_width(flag, spec)),
        # self-attn at the decoder width; cross: q decoder, k/v encoder width
        "attn_1": mha_init(k1, heads, hidden, flag,
                           e_width=spec.vid_feat_size, d_width=spec.embed_size),
        "attn_2": mha_init(k2, heads, hidden, "ed",
                           e_width=spec.vid_feat_size, d_width=spec.embed_size),
        "ff": _ff_init(k3, flag, spec),
    }


def _decoder_layer(params, x, e_outputs, src_mask, trg_mask, key, heads, train, cdtype):
    ks = jax.random.split(key, 6)
    x2 = _norm(params["norm_1"], x, train)
    x = x + dropout(ks[0], mha_apply(params["attn_1"], heads, x2, x2, x2, trg_mask,
                                     dropout_key=ks[1], dropout_rate=INTERNAL_DROPOUT,
                                     train=train, compute_dtype=cdtype),
                    INTERNAL_DROPOUT, train).astype(x.dtype)
    x2 = _norm(params["norm_2"], x, train)
    x = x + dropout(ks[2], mha_apply(params["attn_2"], heads, x2, e_outputs, e_outputs,
                                     src_mask,
                                     dropout_key=ks[3], dropout_rate=INTERNAL_DROPOUT,
                                     train=train, compute_dtype=cdtype),
                    INTERNAL_DROPOUT, train).astype(x.dtype)
    x2 = _norm(params["norm_3"], x, train)
    x = x + dropout(ks[4], _ff_block(params["ff"], x2, ks[5], train, cdtype),
                    INTERNAL_DROPOUT, train).astype(x.dtype)
    return x


def init_params(key: jax.Array, spec: base.ModelSpec, glove_vectors) -> dict:
    n, heads, hidden = spec.tf_layers, spec.tf_heads, spec.hidden_size
    keys = jax.random.split(key, 2 * n + 2)
    enc_layers = [_encoder_layer_init(keys[i], heads, hidden, "e", spec)
                  for i in range(n)]
    dec_layers = [_decoder_layer_init(keys[n + i], heads, hidden, "d", spec)
                  for i in range(n)]
    return {
        "encoder": {
            "pe": jnp.asarray(make_positional_encoding(spec.vid_feat_size)),
            # stacked layers -> scanned-over pytree (one compile for all 6)
            "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *enc_layers),
            "norm": norm_init(_width("e", spec)),
        },
        "decoder": {
            "embedding": embedding_init(glove_vectors, spec.padded_vocab_size),
            "pe": jnp.asarray(make_positional_encoding(spec.embed_size)),
            "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dec_layers),
            # reference creates norm AND norm_out; only norm_out is used in
            # forward (TransformerNet.py:220-221,243) — both kept for
            # checkpoint-conversion completeness.
            "norm": norm_init(_width("d", spec)),
            "norm_out": norm_init(_width("d", spec)),
            # reference hard-codes Linear(300, vocab) (TransformerNet.py:222)
            "pred_linear": dense_init(keys[-1], _width("d", spec), spec.padded_vocab_size),
        },
    }


def _pe_scale(scale_len) -> jax.Array:
    """The reference's sqrt(seq_len) embedding scale (TransformerNet.py:129).
    Factored out so tests can neutralize it when proving the KV-cached fast
    decode equals the parity decode modulo this scale."""
    return jnp.sqrt(jnp.asarray(scale_len, jnp.float32))


def _apply_pe(pe: jax.Array, x: jax.Array, scale_len) -> jax.Array:
    """x * sqrt(scale_len) + pe[:L] — the reference's sqrt(x.shape[1]) scaling
    (TransformerNet.py:127-134). scale_len may be a traced scalar (decode)."""
    seq_len = x.shape[1]
    return x * _pe_scale(scale_len) + pe[None, :seq_len, :]


def _run_stack(layer_fn, stacked_params, x, key, n_layers, *args):
    """Run N structurally-identical layers via lax.scan over stacked params."""
    keys = jax.random.split(key, n_layers)

    def body(h, inp):
        p, k = inp
        return layer_fn(p, h, k, *args), None

    x, _ = jax.lax.scan(body, x, (stacked_params, keys))
    return x


def encode(params, spec: base.ModelSpec, vid_features: jax.Array,
           src_mask, rng, train: bool) -> jax.Array:
    """(B, N, 4096) -> encoder outputs (B, N, 4096) (TransformerNet.py:190-200)."""
    enc = params["encoder"]
    x = _apply_pe(enc["pe"], vid_features, vid_features.shape[1])
    x = _stream_cast(x, train, spec.cdtype)

    def layer(p, h, k, mask):
        return _encoder_layer(p, h, mask, k, spec.tf_heads, train, spec.cdtype)

    x = _run_stack(layer, enc["layers"], x, rng, spec.tf_layers, src_mask)
    return _norm(enc["norm"], x, train)


def decode_train(params, spec: base.ModelSpec, e_outputs, s, src_mask, trg_mask,
                 rng, train: bool) -> jax.Array:
    """Parallel training pass. NOTE: input is the unshifted target sentence,
    replicating the reference bug (TransformerNet.py:237-243)."""
    dec = params["decoder"]
    k_layers, k_pred = jax.random.split(rng)
    x = embed(dec["embedding"], s.astype(jnp.int32))
    x = _apply_pe(dec["pe"], x, x.shape[1])
    x = _stream_cast(x, train, spec.cdtype)

    def layer(p, h, k, eo, sm, tm):
        return _decoder_layer(p, h, eo, sm, tm, k, spec.tf_heads, train, spec.cdtype)

    x = _run_stack(layer, dec["layers"], x, k_layers, spec.tf_layers,
                   e_outputs, src_mask, trg_mask)
    x = _norm(dec["norm_out"], x, train)
    x = dropout(k_pred, x, spec.dropout_p, train)
    return mask_vocab_pad(dense(dec["pred_linear"], x, spec.cdtype), spec.vocab_size)


def decode_greedy(params, spec: base.ModelSpec, e_outputs, src_mask) -> jax.Array:
    """Greedy decode re-running the full stack per step (parity with
    TransformerNet.py:246-263), as one on-device lax.scan.

    Equivalence to the reference's growing-prefix loop: with a causal mask,
    row i-1 of the (padded to max_len) sequence attends only to columns
    <= i-1, and all other ops are positionwise, so its output equals the
    prefix-only run. The traced sqrt(i) PE scale is applied per step.
    """
    dec = params["decoder"]
    b = e_outputs.shape[0]
    l = spec.max_len
    causal = (np.triu(np.ones((l, l)), k=1) == 0)
    causal = jnp.asarray(causal)[None, None, :, :]  # (1,1,L,L)

    outputs0 = jnp.zeros((b, l), dtype=jnp.int32).at[:, 0].set(spec.sos_id)
    dummy_key = jax.random.PRNGKey(0)

    def step(carry, i):
        outputs = carry
        x = embed(dec["embedding"], outputs)
        x = _apply_pe(dec["pe"], x, i + 1)  # prefix length = i+1 -> sqrt(i+1)

        def layer(p, h, k, eo, sm, tm):
            return _decoder_layer(p, h, eo, sm, tm, k, spec.tf_heads,
                                  train=False, cdtype=spec.cdtype)

        h = _run_stack(layer, dec["layers"], x, dummy_key, spec.tf_layers,
                       e_outputs, src_mask, causal)
        h = torch_norm(dec["norm_out"], h)
        h_i = jax.lax.dynamic_slice_in_dim(h, i, 1, axis=1)[:, 0]  # (B, 300)
        logits_i = mask_vocab_pad(dense(dec["pred_linear"], h_i, spec.cdtype),
                                  spec.vocab_size)                 # (B, V)
        next_word = jnp.argmax(logits_i, axis=-1).astype(jnp.int32)
        # write next word at prefix position i+1; the final step's write (index
        # clamped to l-1) lands after the last read, so it never affects logits
        idx = jnp.minimum(i + 1, l - 1)
        old = jax.lax.dynamic_index_in_dim(outputs, idx, axis=1, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(i + 1 < l, next_word, old), idx, axis=1)
        return outputs, logits_i

    outputs, logits = jax.lax.scan(step, outputs0, jnp.arange(l))
    return jnp.transpose(logits, (1, 0, 2))  # (B, L, V)


def _lineage_select(scores_all, anc_b):
    """EXACT ancestry select: out[b,t,h,j] = scores_all[b,t,h,j,anc_b[b,t,j]].

    A true gather, deliberately NOT a one-hot einsum: an einsum with fp32
    operands runs on the MXU at DEFAULT precision, which rounds the fp32
    scores to bf16 inside the contraction and flips near-tied beam choices —
    the round-3 on-chip failure ("FAIL lineage beam ≡ gather beam",
    onchip_r3/tpu_checks.log). A gather moves the bits untouched on every
    backend, so lineage scores match the physical-reorder path exactly.
    """
    idx = anc_b[:, :, None, :, None]          # (B, kt, 1, L, 1) vs (B,kt,h,L,ks)
    return jnp.take_along_axis(scores_all, idx, axis=-1)[..., 0]


def _lineage_gather_rows(cache_b, anc_b):
    """cache_b (B, s, h, L, d), anc_b (B, t, L) -> (B, t, h, L, d):
    out[b, t, h, j, :] = cache_b[b, anc_b[b, t, j], h, j, :].

    A true gather of the ancestry rows of a KV-cache block — bit-moving, like
    _lineage_select. Used for the context V reads: contracting the weights
    against ALL source rows through a one-hot mask puts the nonzero terms at
    ancestry-DEPENDENT (j, s) coordinates, so the reduction's association —
    and therefore the f32 ulp of the result — depended on the ancestry
    pattern (round-4 forensics, onchip_r4/tpu_checks.log). Gathering V first
    and reducing over j alone makes the reduction order ancestry-independent:
    the same stepper then produces bit-identical logits whether beams are
    tracked by ancestry or by physically reordered caches
    (tests/test_lineage_bookkeeping.py)."""
    idx = anc_b[:, :, None, None, :, None]     # (B, t, 1, 1, L, 1)
    out = jnp.take_along_axis(cache_b[:, None], idx, axis=2)
    return out[:, :, 0]                        # (B, t, h, L, d)


def _resolve_decode_weights(decode_weights: str | None) -> str:
    dw = decode_weights or os.environ.get("VCR_DECODE_WEIGHTS", "bf16")
    if dw not in ("bf16", "int8"):
        raise ValueError(
            f"decode_weights must be 'bf16' or 'int8', got {dw!r}")
    return dw


def _maybe_quantize_decoder(per_layer, pred_linear, decode_weights: str):
    """-> (per_layer, pred_linear, dn): int8-quantize every decoder DENSE
    weight (attn q/k/v/out, ff, pred_linear) when decode_weights == "int8"
    (ops/wquant.py W8 fold — halves the per-tick weight byte stream), with
    ``dn`` the matching dense apply. Norms / embedding / PE stay fp32.

    Idempotent: params already holding "wq" codes (pre-quantized once by
    quantize_decoder_params — the serving pool does this at init so the
    per-tick jit receives int8 ARGS instead of re-quantizing f32 weights
    inside every compiled tick) pass through untouched. In-stepper
    quantization is the BATCH-path form: it traces once per decode call and
    XLA hoists the loop-invariant codes out of the token scan."""
    if decode_weights != "int8":
        return per_layer, pred_linear, dense
    from vcr_tpu.ops import wquant

    def q_dense(v):
        return v if "wq" in v else wquant.quantize_dense(v)

    def q_layer(lp):
        out = dict(lp)
        for attn in ("attn_1", "attn_2"):
            out[attn] = {k: q_dense(v) for k, v in lp[attn].items()}
        out["ff"] = {k: q_dense(v) for k, v in lp["ff"].items()}
        return out

    return ([q_layer(lp) for lp in per_layer],
            q_dense(pred_linear), wquant.dense_q)


def quantize_decoder_params(params: dict) -> dict:
    """One-time W8 pre-quantization of the decoder's dense weights (stacked
    layer tree + pred_linear) — ops/wquant.py. The serving pool calls this
    at init so its per-tick jitted step streams int8 weight ARGS; the
    steppers detect the "wq" leaves and skip re-quantizing. Encoder,
    embedding, PE and norms are untouched. Idempotent."""
    from vcr_tpu.ops import wquant

    if "wq" in params["decoder"]["pred_linear"]:
        return params
    dec = dict(params["decoder"])
    layers = dict(dec["layers"])
    for attn in ("attn_1", "attn_2"):
        layers[attn] = {k: wquant.quantize_dense(v)
                        for k, v in layers[attn].items()}
    layers["ff"] = {k: wquant.quantize_dense(v)
                    for k, v in layers["ff"].items()}
    dec["layers"] = layers
    dec["pred_linear"] = wquant.quantize_dense(dec["pred_linear"])
    return dict(params, decoder=dec)


def _attn_hidden(layers: dict) -> int:
    """Attention hidden width off the (possibly W8-quantized) layer tree."""
    q_p = layers["attn_1"]["q"]
    return (q_p["w"] if "w" in q_p else q_p["wq"]).shape[-1]


# EAGER creation of an s4 (jnp.int4) array trips "RecursionError:
# Recursively calling jit" on the axon TPU client (onchip_r5 round-5
# tpu_checks traceback: lax.full -> scalar convert_element_type to S4
# dispatches a jit from inside the eager impl). Creating the same array
# inside a trace lowers fine — so the quantized cache zeros go through a
# jitted thunk, which also makes eager stepper construction (tpu_checks,
# direct decode_greedy_fast calls) backend-portable. Nested under an outer
# jit this inlines; shapes/dtypes are static so the executable is cached.
_jit_zeros = jax.jit(jnp.zeros, static_argnums=(0, 1))


def _ff_eval(ffp, x, cdtype, dn=dense):
    """Eval-time ff (no dropout), parameterized over the dense apply so the
    int8-weight steppers reuse it — op-identical to
    _ff_apply(..., train=False) when dn is the plain dense."""
    return dn(ffp["linear_2"], jax.nn.relu(dn(ffp["linear_1"], x, cdtype)),
              cdtype)


def make_cached_stepper(params, spec: base.ModelSpec, e_outputs,
                        beam_tile: int = 1, lineage: bool = False,
                        kv_cache: str | None = None,
                        decode_weights: str | None = None):
    """KV-cached single-token decoder step — the SERVING-mode cell shared by
    the fast greedy scan and the fast beam search (decode.py).

    NOT token-parity with the reference: the reference rescales the WHOLE
    prefix by sqrt(prefix_len) every step (TransformerNet.py:129), which
    invalidates any cache. Here each token keeps the sqrt(i+1) scale from the
    step it was emitted, so K/V of past positions are reusable. Use the parity
    decoders for reference parity; use this for throughput serving.

    ``e_outputs`` is (B, S, 4096) UNTILED; the stepper serves
    rows = B*beam_tile (beam-major-inner, matching decode._tile_beam).
    Cross-attention K/V are identical across one item's beams, so they are
    projected from the untiled encoder outputs (one 4096-wide matmul per
    video, not per beam — a beam_size× FLOP saving) and repeated afterwards.

    -> (step_fn(state, words, i) -> (state, logits (rows, V)), init_state)
    where state = {"c0".."c{Nl-1}": (ck, cv)}: per-layer (rows, h, L, d_k)
    self-attention caches in the compute dtype (they are cast to it at every
    use anyway; fp32 storage would double the per-step HBM traffic). The
    layer loop is UNROLLED (tf_layers is small and static): a lax.scan over
    layers must restack every layer's cache through the scan's xs/ys each
    step (~2× the whole cache in HBM writes per token), and it forces a
    layers-leading layout whose beam reorder gathers on a non-leading axis —
    measured 6.1 -> 4.9 ms/step (B=128, K=5, real widths) from unrolling.
    Every state leaf is rows-leading, so beam_search's default axis-0 gather
    reorders it directly.

    ``kv_cache="int8"`` (default "bf16"; env ``VCR_KV_CACHE`` overrides the
    default) stores self+cross K/V as per-vector symmetric int8 — the same
    opt-in bounded-error mode as make_slot_stepper (state leaves become
    (k_q, k_s, v_q, v_s) 4-tuples; see that docstring and ops/kvquant.py).

    ``decode_weights="int8"`` (default "bf16"; env ``VCR_DECODE_WEIGHTS``)
    streams every decoder dense weight as per-output-channel int8 — the
    opt-in weight-quantized mode shared with make_slot_stepper (see that
    docstring and ops/wquant.py).
    """
    dec = params["decoder"]
    layers = dec["layers"]
    rows = e_outputs.shape[0] * beam_tile
    l = spec.max_len
    heads = spec.tf_heads
    hidden = _attn_hidden(layers)
    d_k = hidden // heads
    n_layers = spec.tf_layers
    cdt = spec.cdtype

    per_layer = [jax.tree_util.tree_map(lambda a, i=i: a[i], layers)
                 for i in range(n_layers)]
    kv_cache = kv_cache or os.environ.get("VCR_KV_CACHE", "bf16")
    if kv_cache not in ("bf16", "int8", "int4"):
        raise ValueError(
            f"kv_cache must be 'bf16', 'int8' or 'int4', got {kv_cache!r}")
    quant = kv_cache in ("int8", "int4")
    if quant:
        from vcr_tpu.ops import kvquant

        qmax, qdtype = kvquant.mode_params(kv_cache)
    # decode_weights="int8": rebind `dense` (locally) to the W8 apply, with
    # per_layer/pred_p holding int8 codes + per-column scales — every dense
    # call below then streams int8 weights from HBM (ops/wquant.py). The
    # "bf16" default keeps the plain apply and fp32 weights, bit-identical
    # to the pre-option stepper.
    decode_weights = _resolve_decode_weights(decode_weights)
    per_layer, pred_p, dense = _maybe_quantize_decoder(
        per_layer, dec["pred_linear"], decode_weights)

    def heads_split(x):  # (rows, S, hidden) -> (rows, h, S, d_k)
        return x.reshape(x.shape[0], -1, heads, d_k).transpose(0, 2, 1, 3)

    # cross-attention K/V precomputed once per layer from the UNTILED encoder
    # outputs (the reference's src mask is all-ones: cross-attention is
    # unmasked), then repeated per beam.
    cross = []
    for lp in per_layer:
        k = heads_split(dense(lp["attn_2"]["k"], e_outputs, cdt)).astype(cdt)
        v = heads_split(dense(lp["attn_2"]["v"], e_outputs, cdt)).astype(cdt)
        if beam_tile > 1:
            k = jnp.repeat(k, beam_tile, axis=0)
            v = jnp.repeat(v, beam_tile, axis=0)
        if quant:
            kq, ks = kvquant.quantize(k, qmax=qmax, qdtype=qdtype)
            vq, vs = kvquant.quantize(v, qmax=qmax, qdtype=qdtype)
            cross.append((kq, ks[..., 0], vq, vs[..., 0]))
        else:
            cross.append((k, v))

    if quant:
        zq = _jit_zeros((rows, heads, l, d_k), qdtype)
        zs = jnp.zeros((rows, heads, l), jnp.float32)
        init_state = {f"c{i}": (zq, zs, zq, zs) for i in range(n_layers)}
    else:
        zeros = jnp.zeros((rows, heads, l, d_k), cdt)
        init_state = {f"c{i}": (zeros, zeros) for i in range(n_layers)}
    pos_mask_row = jnp.arange(l)                     # attend to cols <= i

    def dus_write(c_q, c_s, new, i):
        """Quantize this step's (rows, h, 1, d_k) vectors; write codes+scales
        at position i (dynamic_update_slice, like the bf16 writes)."""
        q, s = kvquant.quantize(new, qmax=qmax, qdtype=qdtype)  # (rows,h,1,d), (rows,h,1,1)
        c_q = jax.lax.dynamic_update_slice_in_dim(c_q, q, i, axis=2)
        c_s = jax.lax.dynamic_update_slice_in_dim(
            c_s, s[..., 0].astype(c_s.dtype), i, axis=2)
        return c_q, c_s

    # ------------------------------------------------------------- lineage
    # Gather-free beam mode (lineage=True): the KV caches are written once at
    # each row's own slot and NEVER physically reordered. Instead the search
    # carries an ancestry matrix anc (rows, L) — anc[r, j] = which of the
    # item's K physical rows held beam r's token-j KV when it was written —
    # and self-attention reads through it: scores are computed against ALL K
    # source rows of the item's cache block (one pass over the same bytes the
    # plain attend already reads) and selected through the ancestry. This
    # removes the per-step read+write of every cache leaf that the physical
    # reorder costs (~2/3 of the beam step's cache HBM traffic; VERDICT r2 #5).
    # Numerics (round-4 contract): BOTH ancestry reads are true gathers,
    # never one-hot matmuls — scores via _lineage_select, context V rows via
    # _lineage_gather_rows — so the stepper's output is independent of WHERE
    # the ancestry points: the bookkeeping is bit-identical to physically
    # reordering the caches (tpu_checks "lineage bookkeeping ≡ physical
    # reorder"; tests/test_lineage_bookkeeping.py). What is NOT bit-equal is
    # this stepper vs the gather-path stepper (attend_cached): their dots
    # have different SHAPES (`bthjs` vs `bhqk`), which differ at f32 ulp on
    # the MXU and amplify to one-bf16-quantum logit gaps at the next cast —
    # tokens can flip on near-ties (onchip_r4/tpu_checks.log forensics).
    # Hence the serving default is the gather path; lineage is the opt-in
    # low-traffic variant (decode.transformer_beam_decode_fast).
    b_items = rows // max(beam_tile, 1)
    row_local = (jnp.arange(rows) % max(beam_tile, 1)).astype(jnp.int32)

    def attend_lineage(attn_p, x2, cache, i, anc):
        k_b = beam_tile
        q = heads_split(dense(attn_p["q"], x2, cdt))          # (rows, h, 1, d_k)
        k_new = heads_split(dense(attn_p["k"], x2, cdt))
        v_new = heads_split(dense(attn_p["v"], x2, cdt))
        qb = q.reshape(b_items, k_b, heads, d_k)
        anc_b = anc.reshape(b_items, k_b, l)
        if quant:
            ck_q, ck_s, cv_q, cv_s = cache
            ck_q, ck_s = dus_write(ck_q, ck_s, k_new, i)
            cv_q, cv_s = dus_write(cv_q, cv_s, v_new, i)
            cache = (ck_q, ck_s, cv_q, cv_s)
            ckb = ck_q.reshape(b_items, k_b, heads, l, d_k)
            cvb = cv_q.reshape(b_items, k_b, heads, l, d_k)
            scores_all = jnp.einsum("bthd,bshjd->bthjs", qb.astype(cdt),
                                    ckb.astype(cdt),
                                    preferred_element_type=jnp.float32
                                    ) / (d_k ** 0.5)
            # fold K scales (source beam s, position j) BEFORE the select —
            # elementwise, gather contract untouched
            scores_all = scores_all * ck_s.reshape(
                b_items, k_b, heads, l).transpose(0, 2, 3, 1)[:, None]
        else:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_new.astype(ck.dtype), i, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_new.astype(cv.dtype), i, axis=2)
            cache = (ck, cv)
            ckb = ck.reshape(b_items, k_b, heads, l, d_k)
            cvb = cv.reshape(b_items, k_b, heads, l, d_k)
            # (B, k_tgt, h, L, k_src): every target beam vs every source row
            scores_all = jnp.einsum("bthd,bshjd->bthjs", qb.astype(cdt),
                                    ckb.astype(cdt),
                                    preferred_element_type=jnp.float32
                                    ) / (d_k ** 0.5)
        scores = _lineage_select(scores_all, anc_b)
        scores = jnp.where(pos_mask_row[None, None, None, :] > i, -1e9, scores)
        w = jax.nn.softmax(scores, axis=-1)                   # (B, kt, h, L)
        # context: gather the ancestry V rows (bit-moving), then reduce over
        # positions j ONLY — the products match the physical-reorder path's
        # (bf16 w × bf16 v, exact in f32) and the reduction order no longer
        # depends on the ancestry pattern (see _lineage_gather_rows).
        vsel = _lineage_gather_rows(cvb, anc_b)               # (B, kt, h, L, d)
        if quant:
            vsels = _lineage_gather_rows(cv_s.reshape(
                b_items, k_b, heads, l)[..., None], anc_b)[..., 0]
            ctx = jnp.sum((w.astype(cdt).astype(jnp.float32)
                           * vsels)[..., None]
                          * vsel.astype(jnp.float32), axis=3)
        else:
            ctx = jnp.sum(w.astype(cdt).astype(jnp.float32)[..., None]
                          * vsel.astype(jnp.float32), axis=3)  # (B, kt, h, d)
        out = ctx.reshape(rows, 1, hidden)
        return dense(attn_p["out"], out, cdt), cache

    def attend_cached(attn_p, x2, cache, i):
        """Single-token self-attention against the cache (incl. this token)."""
        q = heads_split(dense(attn_p["q"], x2, cdt))          # (rows, h, 1, d_k)
        k_new = heads_split(dense(attn_p["k"], x2, cdt))
        v_new = heads_split(dense(attn_p["v"], x2, cdt))
        if quant:
            ck_q, ck_s, cv_q, cv_s = cache
            ck_q, ck_s = dus_write(ck_q, ck_s, k_new, i)
            cv_q, cv_s = dus_write(cv_q, cv_s, v_new, i)
            cache = (ck_q, ck_s, cv_q, cv_s)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                ck_q.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            scores = scores * ck_s[:, :, None, :]
            scores = jnp.where(pos_mask_row[None, None, None, :] > i, -1e9,
                               scores)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             (w * cv_s[:, :, None, :]).astype(cdt),
                             cv_q.astype(cdt),
                             preferred_element_type=jnp.float32)
        else:
            ck, cv = cache
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k_new.astype(ck.dtype), i, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v_new.astype(cv.dtype), i, axis=2)
            cache = (ck, cv)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                ck.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            scores = jnp.where(pos_mask_row[None, None, None, :] > i, -1e9,
                               scores)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), cv.astype(cdt),
                             preferred_element_type=jnp.float32)
        out = ctx.transpose(0, 2, 1, 3).reshape(rows, 1, hidden)
        return dense(attn_p["out"], out, cdt), cache

    def attend_cross(attn_p, x2, kxv):
        q = heads_split(dense(attn_p["q"], x2, cdt))
        if quant:
            kq, ks, vq, vs = kxv
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                kq.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            scores = scores * ks[:, :, None, :]
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             (w * vs[:, :, None, :]).astype(cdt),
                             vq.astype(cdt),
                             preferred_element_type=jnp.float32)
        else:
            k, v = kxv
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                k.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), v.astype(cdt),
                             preferred_element_type=jnp.float32)
        out = ctx.transpose(0, 2, 1, 3).reshape(rows, 1, hidden)
        return dense(attn_p["out"], out, cdt)

    def step_fn(state, words, i):
        x = embed(dec["embedding"], words)[:, None, :]          # (rows, 1, 300)
        x = x * _pe_scale(i + 1) \
            + jax.lax.dynamic_slice_in_dim(dec["pe"], i, 1, axis=0)[None]

        new_state = {}
        anc = None
        if lineage:
            # this step's token KV is written at each row's OWN slot: claim
            # column i before attending (anc rows for j>i are stale inherited
            # values — masked off until their step claims them)
            anc = jax.lax.dynamic_update_slice_in_dim(
                state["anc"], row_local[:, None], i, axis=1)
            new_state["anc"] = anc
        for li in range(n_layers):
            layer_p = per_layer[li]
            x2 = torch_norm(layer_p["norm_1"], x)
            if lineage:
                a, cache = attend_lineage(layer_p["attn_1"], x2,
                                          state[f"c{li}"], i, anc)
            else:
                a, cache = attend_cached(layer_p["attn_1"], x2,
                                         state[f"c{li}"], i)
            x = x + a
            x2 = torch_norm(layer_p["norm_2"], x)
            x = x + attend_cross(layer_p["attn_2"], x2, cross[li])
            x2 = torch_norm(layer_p["norm_3"], x)
            x = x + _ff_eval(layer_p["ff"], x2, cdt, dense)
            new_state[f"c{li}"] = cache

        h = torch_norm(dec["norm_out"], x)[:, 0]
        logits = mask_vocab_pad(dense(pred_p, h, cdt), spec.vocab_size)
        return new_state, logits

    if lineage:
        init_state = dict(init_state,
                          anc=jnp.tile(row_local[:, None], (1, l)))

        def lineage_reorder(state, flat_src):
            """Beam reorder for the lineage stepper: ONLY the ancestry matrix
            is permuted (rows·L int32); the KV caches stay in place."""
            return {k: (v[flat_src] if k == "anc" else v)
                    for k, v in state.items()}

        return step_fn, init_state, lineage_reorder
    return step_fn, init_state


def make_slot_stepper(params, spec: base.ModelSpec, beam_tile: int = 1,
                      lineage: bool = False, kv_cache: str | None = None,
                      decode_weights: str | None = None):
    """Per-slot-position KV-cached decode cell for continuous-batching
    serving (serving_continuous.ContinuousCaptioner).

    make_cached_stepper advances one GLOBAL step scalar — fine when every row
    of the batch decodes position i together, impossible when slots are
    admitted at different times. Here every row carries its own position:
    ``i_vec (rows,) int32``. The three position uses become per-row:
    the cache write is a scatter at (row, :, i_vec[row], :), the causal mask
    compares pos > i_vec[:, None], and the PE term/scale gather pe[i_vec] /
    sqrt(i_vec + 1). With a uniform i_vec the math is element-identical to
    make_cached_stepper (locked by tests/test_serving_continuous.py parity
    vs decode_greedy_fast).

    Cross-attention K/V depend on the slot's VIDEO, so unlike
    make_cached_stepper they live in slot state (computed once per admission
    by ``cross_state``), not in a construction-time closure.

    Returns (step_fn, init_self_state, cross_state):
      step_fn(state, words (rows,), i_vec (rows,)) -> (state, logits (rows, V))
      init_self_state(rows) -> {"c{l}": (ck, cv) (rows, h, max_len, d_k)}
      cross_state(e_outputs (rows, S, d)) -> {"x{l}": (kx, vx) (rows, h, S, d_k)}
    and slot state = {**init_self_state(R), **cross_state(...)}; every leaf is
    rows-leading so admission can scatter rows in.

    ``lineage=True`` (with ``beam_tile=K``) is the continuous-BEAM cell: rows
    are slot-major groups of K beams, KV caches are written once at each
    row's own slot and NEVER physically reordered; the state gains an
    ``anc (rows, max_len)`` ancestry matrix (same design as
    make_cached_stepper(lineage=True), here with per-row positions) and beam
    reordering permutes ONLY that matrix. Both self-attention ancestry reads
    are true gathers (_lineage_select for scores, _lineage_gather_rows for
    the context V rows), so the bookkeeping is bit-identical to a physical
    reorder on every backend including the MXU (see the numerics contract in
    make_cached_stepper). init_self_state then also contains the
    identity ancestry; after
    admission each fresh group's ancestry must be re-armed to the local
    pattern (row % K repeated across columns) — tiling an A-row encode K-wide
    would wrongly duplicate it (ContinuousCaptioner._admit does this).

    ``kv_cache="int8"`` (default ``"bf16"``; env ``VCR_KV_CACHE`` overrides
    the default) stores self AND cross K/V as per-vector symmetric int8 with
    one fp32 scale per (row, head, position) — ops/kvquant.py. Decode ticks
    are HBM-bound on the cache reads (onchip_r4/diag_slot_tick.log), so
    halving the cache byte stream buys throughput; the dequantization folds
    into the SMALL score-side tensors (scores·s_k after the q·K dot, w·s_v
    before the ·V dot) so nothing cache-sized materializes. NOT bit-identical
    to the bf16 path (bounded quantization error — tests/test_kv_quant.py);
    the lineage bookkeeping contract (ancestry-tracking ≡ physical reorder,
    bit-exact) still holds WITHIN int8 mode because codes and scales move
    through the same true gathers. State leaves become 4-tuples
    (k_q, k_s, v_q, v_s) per layer.

    ``decode_weights="int8"`` (default ``"bf16"``; env ``VCR_DECODE_WEIGHTS``
    overrides the default) stores every decoder DENSE weight (attn q/k/v/out,
    ff, pred_linear) as per-output-channel symmetric int8 — ops/wquant.py.
    Weights stream from HBM once per tick regardless of R, so at int8/int4
    KV caches they are the largest remaining byte term; this halves it.
    Bounded-error like the KV modes (tests/test_weight_quant.py); composes
    orthogonally with ``kv_cache``.
    """
    dec = params["decoder"]
    layers = dec["layers"]
    heads = spec.tf_heads
    hidden = _attn_hidden(layers)
    d_k = hidden // heads
    n_layers = spec.tf_layers
    l = spec.max_len
    cdt = spec.cdtype
    per_layer = [jax.tree_util.tree_map(lambda a, i=i: a[i], layers)
                 for i in range(n_layers)]
    pos_row = jnp.arange(l)

    # Cache writes default to one-hot MASKED full-cache rewrites (pure VPU
    # elementwise; value-identical — a write is a data move) instead of the
    # 2-per-layer per-row-position SCATTERS: XLA TPU scatters serialize, and
    # the on-chip A/B (scripts/diag_slot_tick.py, onchip_r4/diag_slot_tick.log)
    # measured 0.879 vs 1.506 ms/tick at R=512 — 1.71x. The masked form trades
    # scatter latency for (R,h,L,d) r+w bandwidth per leaf, a win at serving
    # cache sizes. VCR_SLOT_WRITE=scatter restores the scatter form.
    masked_write = os.environ.get("VCR_SLOT_WRITE", "masked") != "scatter"
    kv_cache = kv_cache or os.environ.get("VCR_KV_CACHE", "bf16")
    if kv_cache not in ("bf16", "int8", "int4"):
        raise ValueError(
            f"kv_cache must be 'bf16', 'int8' or 'int4', got {kv_cache!r}")
    quant = kv_cache in ("int8", "int4")
    if quant:
        from vcr_tpu.ops import kvquant

        qmax, qdtype = kvquant.mode_params(kv_cache)
    # decode_weights="int8": rebind `dense` (locally) to the W8 apply with
    # int8 codes + per-column scales in per_layer/pred_p — see
    # make_cached_stepper and ops/wquant.py. "bf16" keeps the plain apply.
    decode_weights = _resolve_decode_weights(decode_weights)
    per_layer, pred_p, dense = _maybe_quantize_decoder(
        per_layer, dec["pred_linear"], decode_weights)

    def cache_write(c, new, i_vec, rows_idx):
        """Write this step's (rows, h, d_k) K/V at [r, :, i_vec[r], :]."""
        if masked_write:
            m = (pos_row[None, :] == i_vec[:, None])[:, None, :, None]
            return jnp.where(m, new.astype(c.dtype)[:, :, None, :], c)
        return c.at[rows_idx, :, i_vec, :].set(new.astype(c.dtype))

    def cache_write_s(c, new_s, i_vec, rows_idx):
        """Write this step's (rows, h) quantization scales at [r, :, i_vec[r]]."""
        if masked_write:
            m = (pos_row[None, :] == i_vec[:, None])[:, None, :]
            return jnp.where(m, new_s[:, :, None], c)
        return c.at[rows_idx, :, i_vec].set(new_s)

    def quant_write(c_q, c_s, new, i_vec, rows_idx):
        """Quantize this step's (rows, h, d_k) vectors and write codes+scales."""
        q, s = kvquant.quantize(new, qmax=qmax, qdtype=qdtype)
        return (cache_write(c_q, q, i_vec, rows_idx),
                cache_write_s(c_s, s[..., 0].astype(c_s.dtype), i_vec,
                              rows_idx))

    def heads_split(x):  # (rows, S, hidden) -> (rows, h, S, d_k)
        return x.reshape(x.shape[0], -1, heads, d_k).transpose(0, 2, 1, 3)

    def cross_state(e_outputs):
        out = {}
        for li, lp in enumerate(per_layer):
            k = heads_split(dense(lp["attn_2"]["k"], e_outputs, cdt)).astype(cdt)
            v = heads_split(dense(lp["attn_2"]["v"], e_outputs, cdt)).astype(cdt)
            if quant:
                kq, ks = kvquant.quantize(k, qmax=qmax, qdtype=qdtype)
                vq, vs = kvquant.quantize(v, qmax=qmax, qdtype=qdtype)
                out[f"x{li}"] = (kq, ks[..., 0], vq, vs[..., 0])
            else:
                out[f"x{li}"] = (k, v)
        return out

    def init_self_state(rows: int):
        if quant:
            zq = _jit_zeros((rows, heads, l, d_k), qdtype)
            zs = jnp.zeros((rows, heads, l), jnp.float32)
            out = {f"c{li}": (zq, zs, zq, zs) for li in range(n_layers)}
        else:
            z = jnp.zeros((rows, heads, l, d_k), cdt)
            out = {f"c{li}": (z, z) for li in range(n_layers)}
        if lineage:
            row_local = (jnp.arange(rows) % beam_tile).astype(jnp.int32)
            out["anc"] = jnp.tile(row_local[:, None], (1, l))
        return out

    def attend_self_lineage(attn_p, x2, cache, i_vec, anc, rows_idx):
        g = x2.shape[0] // beam_tile
        k_b = beam_tile
        q = heads_split(dense(attn_p["q"], x2, cdt))[:, :, 0, :]  # (rows,h,dk)
        k_new = heads_split(dense(attn_p["k"], x2, cdt))[:, :, 0, :]
        v_new = heads_split(dense(attn_p["v"], x2, cdt))[:, :, 0, :]
        qb = q.reshape(g, k_b, heads, d_k)
        anc_b = anc.reshape(g, k_b, l)
        if quant:
            ck_q, ck_s, cv_q, cv_s = cache
            ck_q, ck_s = quant_write(ck_q, ck_s, k_new, i_vec, rows_idx)
            cv_q, cv_s = quant_write(cv_q, cv_s, v_new, i_vec, rows_idx)
            cache = (ck_q, ck_s, cv_q, cv_s)
            ckb, cvb = (c.reshape(g, k_b, heads, l, d_k) for c in (ck_q, cv_q))
            scores_all = jnp.einsum("bthd,bshjd->bthjs", qb.astype(cdt),
                                    ckb.astype(cdt),
                                    preferred_element_type=jnp.float32
                                    ) / (d_k ** 0.5)        # (g, kt, h, L, ks)
            # fold the K scales (source beam s, position j) BEFORE the select:
            # elementwise, so the gather contract is untouched
            scores_all = scores_all * ck_s.reshape(
                g, k_b, heads, l).transpose(0, 2, 3, 1)[:, None]
            scores = _lineage_select(scores_all, anc_b)
        else:
            ck, cv = cache
            ck = cache_write(ck, k_new, i_vec, rows_idx)
            cv = cache_write(cv, v_new, i_vec, rows_idx)
            cache = (ck, cv)
            ckb = ck.reshape(g, k_b, heads, l, d_k)
            cvb = cv.reshape(g, k_b, heads, l, d_k)
            scores_all = jnp.einsum("bthd,bshjd->bthjs", qb.astype(cdt),
                                    ckb.astype(cdt),
                                    preferred_element_type=jnp.float32
                                    ) / (d_k ** 0.5)        # (g, kt, h, L, ks)
            scores = _lineage_select(scores_all, anc_b)
        mask = pos_row[None, None, None, :] > i_vec.reshape(
            g, k_b)[:, :, None, None]
        w = jax.nn.softmax(jnp.where(mask, -1e9, scores), axis=-1)
        # ancestry-gathered V + j-only reduction: reduction order independent
        # of the ancestry pattern (see _lineage_gather_rows)
        if quant:
            vselq = _lineage_gather_rows(cvb, anc_b)          # (g, kt, h, L, d)
            vsels = _lineage_gather_rows(cv_s.reshape(
                g, k_b, heads, l)[..., None], anc_b)[..., 0]  # (g, kt, h, L)
            ctx = jnp.sum((w.astype(cdt).astype(jnp.float32)
                           * vsels)[..., None]
                          * vselq.astype(jnp.float32), axis=3)
        else:
            vsel = _lineage_gather_rows(cvb, anc_b)           # (g, kt, h, L, d)
            ctx = jnp.sum(w.astype(cdt).astype(jnp.float32)[..., None]
                          * vsel.astype(jnp.float32), axis=3)  # (g, kt, h, d)
        out = ctx.reshape(x2.shape[0], 1, hidden)
        return dense(attn_p["out"], out, cdt), cache

    def attend_self(attn_p, x2, cache, i_vec, rows_idx):
        q = heads_split(dense(attn_p["q"], x2, cdt))          # (rows, h, 1, d_k)
        k_new = heads_split(dense(attn_p["k"], x2, cdt))[:, :, 0, :]
        v_new = heads_split(dense(attn_p["v"], x2, cdt))[:, :, 0, :]
        if quant:
            ck_q, ck_s, cv_q, cv_s = cache
            ck_q, ck_s = quant_write(ck_q, ck_s, k_new, i_vec, rows_idx)
            cv_q, cv_s = quant_write(cv_q, cv_s, v_new, i_vec, rows_idx)
            cache = (ck_q, ck_s, cv_q, cv_s)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                ck_q.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            scores = scores * ck_s[:, :, None, :]
            mask = pos_row[None, None, None, :] > i_vec[:, None, None, None]
            w = jax.nn.softmax(jnp.where(mask, -1e9, scores), axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             (w * cv_s[:, :, None, :]).astype(cdt),
                             cv_q.astype(cdt),
                             preferred_element_type=jnp.float32)
        else:
            ck, cv = cache
            ck = cache_write(ck, k_new, i_vec, rows_idx)
            cv = cache_write(cv, v_new, i_vec, rows_idx)
            cache = (ck, cv)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                ck.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            mask = pos_row[None, None, None, :] > i_vec[:, None, None, None]
            w = jax.nn.softmax(jnp.where(mask, -1e9, scores), axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), cv.astype(cdt),
                             preferred_element_type=jnp.float32)
        out = ctx.transpose(0, 2, 1, 3).reshape(x2.shape[0], 1, hidden)
        return dense(attn_p["out"], out, cdt), cache

    def attend_cross(attn_p, x2, kxv):
        q = heads_split(dense(attn_p["q"], x2, cdt))
        if quant:
            kq, ks, vq, vs = kxv
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                kq.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            scores = scores * ks[:, :, None, :]
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd",
                             (w * vs[:, :, None, :]).astype(cdt),
                             vq.astype(cdt),
                             preferred_element_type=jnp.float32)
        else:
            k, v = kxv
            scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cdt),
                                k.astype(cdt),
                                preferred_element_type=jnp.float32
                                ) / (d_k ** 0.5)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cdt), v.astype(cdt),
                             preferred_element_type=jnp.float32)
        out = ctx.transpose(0, 2, 1, 3).reshape(x2.shape[0], 1, hidden)
        return dense(attn_p["out"], out, cdt)

    def step_fn(state, words, i_vec):
        rows_idx = jnp.arange(words.shape[0])
        x = embed(dec["embedding"], words)[:, None, :]
        x = (x * _pe_scale(i_vec + 1)[:, None, None]
             + dec["pe"][i_vec][:, None, :])
        new_state = dict(state)
        anc = None
        if lineage:
            # this step's KV is written at each row's OWN slot: claim column
            # i_vec[row] before attending
            anc = state["anc"].at[rows_idx, i_vec].set(
                (rows_idx % beam_tile).astype(jnp.int32))
            new_state["anc"] = anc
        for li in range(n_layers):
            lp = per_layer[li]
            x2 = torch_norm(lp["norm_1"], x)
            if lineage:
                a, cache = attend_self_lineage(lp["attn_1"], x2,
                                               state[f"c{li}"], i_vec, anc,
                                               rows_idx)
            else:
                a, cache = attend_self(lp["attn_1"], x2, state[f"c{li}"],
                                       i_vec, rows_idx)
            x = x + a
            x2 = torch_norm(lp["norm_2"], x)
            x = x + attend_cross(lp["attn_2"], x2, state[f"x{li}"])
            x2 = torch_norm(lp["norm_3"], x)
            x = x + _ff_eval(lp["ff"], x2, cdt, dense)
            new_state[f"c{li}"] = cache
        h = torch_norm(dec["norm_out"], x)[:, 0]
        logits = mask_vocab_pad(dense(pred_p, h, cdt), spec.vocab_size)
        return new_state, logits

    return step_fn, init_self_state, cross_state


def decode_greedy_fast(params, spec: base.ModelSpec, e_outputs, src_mask=None,
                       kv_cache: str | None = None,
                       decode_weights: str | None = None) -> jax.Array:
    """KV-cached greedy decode — ~L× fewer decoder FLOPs than the parity scan
    (see make_cached_stepper for the PE-scale deviation). -> tokens (B, L).
    ``kv_cache="int8"`` / ``decode_weights="int8"``: the opt-in quantized
    cache / weight modes (bounded-error)."""
    del src_mask
    b = e_outputs.shape[0]
    step_fn, init_state = make_cached_stepper(params, spec, e_outputs,
                                              kv_cache=kv_cache,
                                              decode_weights=decode_weights)

    def step(carry, i):
        words, state = carry
        state, logits = step_fn(state, words, i)
        next_word = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (next_word, state), next_word

    sos = jnp.full((b,), spec.sos_id, dtype=jnp.int32)
    _, tokens = jax.lax.scan(step, (sos, init_state), jnp.arange(spec.max_len))
    return jnp.transpose(tokens, (1, 0))  # (B, L)


def create_masks_inp(vid_features: jax.Array) -> jax.Array:
    """All-ones src mask (B,1,1,N) (TransformerNet.py:267-269)."""
    b, n = vid_features.shape[:2]
    return jnp.ones((b, 1, 1, n), dtype=jnp.float32)


def create_masks_trg(s: jax.Array, s_len: jax.Array) -> jax.Array:
    """Length mask ∧ causal no-peek -> (B,1,L,L) (TransformerNet.py:271-286)."""
    b, l = s.shape
    length = (jnp.arange(l)[None, :] < s_len[:, None])          # (B, L) over columns
    nopeak = jnp.asarray(np.triu(np.ones((l, l)), k=1) == 0)    # (L, L)
    mask = length[:, None, :] & nopeak[None, :, :]              # (B, L, L)
    return mask[:, None, :, :]


def apply(
    params,
    spec: base.ModelSpec,
    vid_feats: jax.Array,
    s: Optional[jax.Array] = None,
    s_len: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,
) -> jax.Array:
    """Full forward (TransformerNet.py:288-299). Train: parallel pass with
    length∧causal target mask. Eval: greedy scan."""
    del teacher_force_prob
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_enc, k_dec = jax.random.split(rng)
    src_mask = create_masks_inp(vid_feats)
    e_outputs = encode(params, spec, vid_feats, src_mask, k_enc, train)
    if train:
        assert s is not None and s_len is not None
        trg_mask = create_masks_trg(s, s_len)
        return decode_train(params, spec, e_outputs, s, src_mask, trg_mask, k_dec, train)
    return decode_greedy(params, spec, e_outputs, src_mask)


base.register("transformer", init_params, apply)
