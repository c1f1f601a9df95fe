"""Decoding: greedy (reference-parity, built into each model's eval path) and
on-device beam search.

The reference only implements greedy argmax rollouts (S2VTModel.py:148-177,
S2VTAttModel.py:190-191, TransformerNet.py:246-263); beam search is part of the
rebuild's decode surface (BASELINE.md "greedy/beam decode"). Beam width 1
reproduces greedy token-for-token up to (and including) the first eos —
beyond it the search clamps finished rows to eos while the greedy decoders
keep free-running argmax, so raw tails can differ.

Design: the beam dimension is folded into the batch axis (B*K rows through the
exact same cell math the greedy path uses), the whole search is one lax.scan,
and beam reordering is a gather on the state pytree — no host round trips.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.models import base as model_base
from vcr_tpu.models import s2vt, s2vt_att
from vcr_tpu.nn.attention import bahdanau_attend, bahdanau_project_keys
from vcr_tpu.nn.layers import dense, embed, mask_vocab_pad, vdot
from vcr_tpu.nn.rnn import gru_gates
from vcr_tpu.ops.wquant import resolve_mode as wquant_resolve

NEG_INF = -1e9


def _tile_beam(tree, k: int):
    """Repeat each batch row k times: (B, ...) -> (B*K, ...)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0), tree)


def beam_search(
    step_fn: Callable,      # (state, words (B*K,), i) -> (state, logits (B*K, V))
    init_state,             # pytree with a B*K rows axis (leading by default)
    batch: int,
    beam_size: int,
    max_len: int,
    sos_id: int,
    eos_id: int,
    reorder_fn: Callable = None,   # (state, flat_src) -> state
) -> Tuple[jax.Array, jax.Array]:
    """-> (tokens (B, K, L) int32 sorted best-first, scores (B, K)).

    Beam reordering gathers axis 0 of every state leaf — every stepper in
    this repo keeps its state rows-leading for exactly this (including the
    transformer KV caches, rebuilt rows-leading in make_cached_stepper).
    A stepper may override with ``reorder_fn`` when part of its state must
    NOT be physically permuted — the lineage transformer stepper only
    re-indexes its tiny ancestry matrix and leaves the KV caches in place
    (transformer.make_cached_stepper(lineage=True))."""
    k = beam_size

    def reorder_state(state, flat_src):
        if reorder_fn is not None:
            return reorder_fn(state, flat_src)
        return jax.tree_util.tree_map(lambda x: x[flat_src], state)

    words0 = jnp.full((batch * k,), sos_id, dtype=jnp.int32)
    # only beam 0 of each batch row is live at step 0 (all beams are identical
    # copies; without this the top-k would pick k duplicates forever)
    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]), (batch,))
    finished0 = jnp.zeros((batch * k,), dtype=bool)
    tokens0 = jnp.zeros((batch * k, max_len), dtype=jnp.int32)

    def step(carry, i):
        state, words, scores, finished, tokens = carry
        state, logits = step_fn(state, words, i)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        v = logp.shape[-1]

        # finished beams: only continuing with eos is free; everything else dies
        cont = jnp.where(finished[:, None],
                         jnp.full((1, v), NEG_INF).at[0, eos_id].set(0.0),
                         logp)
        # Two-stage exact top-k: per-beam top-k over the vocab first, then
        # top-k over the K*K survivors. A global winner is always in its own
        # beam's top-k, so this equals top-k over the flat (B, K*V) — and the
        # flat form is brutally slow on TPU (measured 5.4ms/step vs 0.5ms at
        # B=128, K=5, V=9088: top_k cost scales with the sorted axis).
        # Tie-breaking matches too: top_k is index-stable, so equal scores
        # order by word id within a beam and by beam across beams.
        s1, i1 = jax.lax.top_k(scores[:, None] + cont, k)    # (B*K, K)
        total = s1.reshape(batch, k * k)
        top_scores, top_idx = jax.lax.top_k(total, k)        # (B, K)
        beam_idx = top_idx // k                              # which source beam
        word_idx = jnp.take_along_axis(
            i1.reshape(batch, k * k), top_idx, axis=1).astype(jnp.int32)

        flat_src = (jnp.arange(batch)[:, None] * k + beam_idx).reshape(-1)
        state = reorder_state(state, flat_src)
        tokens = tokens[flat_src]
        finished = finished[flat_src]
        words = word_idx.reshape(-1)
        tokens = tokens.at[:, i].set(words)
        finished = finished | (words == eos_id)
        return (state, words, top_scores.reshape(-1), finished, tokens), None

    carry0 = (init_state, words0, scores0, finished0, tokens0)
    (state, words, scores, finished, tokens), _ = jax.lax.scan(
        step, carry0, jnp.arange(max_len))
    return tokens.reshape(batch, k, max_len), scores.reshape(batch, k)


def apply_sampling_filters(logits: jax.Array, temperature: float = 1.0,
                           top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """(rows, V) logits -> float32 logits scaled by 1/temperature with
    non-candidates masked to NEG_INF: optional top_k restriction, then
    optional top_p nucleus (smallest probability-sorted set reaching mass
    top_p, over the already-filtered distribution — HF semantics). Shared by
    sample_search and the continuous slot pool's sampling mode."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p and 0.0 < top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        sp = jnp.sort(probs, axis=-1)[:, ::-1]          # descending
        before = jnp.cumsum(sp, axis=-1) - sp           # mass strictly above
        keep = jnp.sum(before < top_p, axis=-1, keepdims=True)  # >= 1
        thresh = jnp.take_along_axis(sp, keep - 1, axis=-1)
        logits = jnp.where(probs < thresh, NEG_INF, logits)
    return logits


def sample_search(
    step_fn: Callable,
    init_state,
    rows: int,
    max_len: int,
    sos_id: int,
    eos_id: int,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Stochastic decoding (beyond the reference's greedy-only surface):
    per-step categorical sampling from softmax(logits / temperature),
    optionally restricted to the top_k logits and/or the top_p nucleus (the
    smallest set of tokens whose probability mass reaches top_p; applied
    after top_k, over the already-filtered distribution — HF semantics).
    Rows that emitted <eos> keep emitting it.
    -> tokens (rows, max_len) int32."""
    words0 = jnp.full((rows,), sos_id, dtype=jnp.int32)
    finished0 = jnp.zeros((rows,), dtype=bool)
    keys = jax.random.split(rng, max_len)

    def step(carry, inp):
        state, words, finished = carry
        i, key = inp
        state, logits = step_fn(state, words, i)
        logits = apply_sampling_filters(logits, temperature, top_k, top_p)
        sampled = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        words = jnp.where(finished, eos_id, sampled)
        finished = finished | (words == eos_id)
        return (state, words, finished), words

    (_, _, _), tokens = jax.lax.scan(step, (init_state, words0, finished0),
                                     (jnp.arange(max_len), keys))
    return jnp.transpose(tokens, (1, 0))


# ---------------------------------------------------------------- S2VT

def _s2vt_stepper(params, spec: model_base.ModelSpec, rows: int,
                  decode_weights: Optional[str] = None):
    """The S2VT decode cell as a (state, words, i) step closure over `rows`
    batch rows (beam folds B*K rows; sampling uses B).

    ``decode_weights="int8"`` (ops/wquant.py): the per-tick dense weights —
    rnn1 w_hh (rnn1's decode input is pad frames, so its x-gates are the
    bias alone and w_ih never streams), rnn2 w_ih/w_hh, and the hidden x
    vocab projection — stream as per-output-channel int8. Weights DOMINATE
    a GRU slot tick's bytes (the recurrent state is h alone), so this
    nearly halves the tick. The dicts are AUGMENTED (codes next to the f32
    originals — encode paths keep reading the originals; see
    wquant.augment_gru), and in-trace augmentation hoists out of the token
    scan like the transformer form. Bounded-error, not token-identical to
    the bf16-weight cell."""
    dw = wquant_resolve(decode_weights)
    if dw == "int8":
        from vcr_tpu.ops import wquant

        params = dict(params,
                      rnn1=wquant.augment_gru(params["rnn1"]),
                      rnn2=wquant.augment_gru(params["rnn2"]),
                      linear=wquant.augment_dense(params["linear"]))
    xg1 = jnp.broadcast_to(params["rnn1"]["b_ih"], (rows, 3 * spec.hidden_size))

    def step_fn(state, words, i):
        del i
        if dw == "int8":
            from vcr_tpu.ops import wquant

            out1 = gru_gates(xg1, state["s1"], params["rnn1"], spec.cdtype,
                             h_gates=wquant.gru_h_gates(
                                 params["rnn1"], state["s1"], spec.cdtype))
            emb = embed(params["embedding"], words)
            x2 = jnp.concatenate([out1, emb], axis=-1)
            xg2 = wquant.gru_x_gates(params["rnn2"], x2, spec.cdtype)
            out2 = gru_gates(xg2, state["s2"], params["rnn2"], spec.cdtype,
                             h_gates=wquant.gru_h_gates(
                                 params["rnn2"], state["s2"], spec.cdtype))
            logits = mask_vocab_pad(
                wquant.dense_aug(params["linear"], out2, spec.cdtype),
                spec.vocab_size)
        else:
            out1 = gru_gates(xg1, state["s1"], params["rnn1"], spec.cdtype)
            emb = embed(params["embedding"], words)
            x2 = jnp.concatenate([out1, emb], axis=-1)
            xg2 = vdot(x2, params["rnn2"]["w_ih"], spec.cdtype) \
                + params["rnn2"]["b_ih"]
            out2 = gru_gates(xg2, state["s2"], params["rnn2"], spec.cdtype)
            logits = mask_vocab_pad(dense(params["linear"], out2, spec.cdtype),
                                    spec.vocab_size)
        return {"s1": out1, "s2": out2}, logits

    return step_fn


def s2vt_beam_from_states(params, spec: model_base.ModelSpec,
                          enc_outs: jax.Array, state1: jax.Array,
                          beam_size: int, eos_id: int,
                          decode_weights: Optional[str] = None
                          ) -> Tuple[jax.Array, jax.Array]:
    """Beam decode from S2VT encoder states — shared by S2VT proper and
    SpatialNet (whose encoder splices spatial contexts, SpatialNet.py:140)."""
    state2 = s2vt._prime_state2(params, spec, enc_outs)
    b = enc_outs.shape[1]
    init_state = _tile_beam({"s1": state1, "s2": state2}, beam_size)
    step_fn = _s2vt_stepper(params, spec, b * beam_size,
                            decode_weights=decode_weights)
    return beam_search(step_fn, init_state, b, beam_size, spec.max_len,
                       spec.sos_id, eos_id)


def s2vt_sample_from_states(params, spec: model_base.ModelSpec,
                            enc_outs: jax.Array, state1: jax.Array,
                            rng: jax.Array, eos_id: int,
                            temperature: float = 1.0, top_k: int = 0,
                            top_p: float = 0.0) -> jax.Array:
    """Sampling decode from S2VT encoder states — shared by S2VT proper and
    SpatialNet (same splice as s2vt_beam_from_states)."""
    state2 = s2vt._prime_state2(params, spec, enc_outs)
    b = enc_outs.shape[1]
    step_fn = _s2vt_stepper(params, spec, b)
    return sample_search(step_fn, {"s1": state1, "s2": state2}, b,
                         spec.max_len, spec.sos_id, eos_id, rng,
                         temperature, top_k, top_p)


def s2vt_sample_decode(params, spec: model_base.ModelSpec, vid_feats: jax.Array,
                       rng: jax.Array, eos_id: int, temperature: float = 1.0,
                       top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """Temperature/top-k/top-p sampling decode for S2VT -> tokens (B, L)."""
    enc_outs, state1 = s2vt.encode(params, spec,
                                   vid_feats.astype(spec.cdtype))
    return s2vt_sample_from_states(params, spec, enc_outs, state1, rng,
                                   eos_id, temperature, top_k, top_p)


def s2vt_beam_decode(params, spec: model_base.ModelSpec, vid_feats: jax.Array,
                     beam_size: int, eos_id: int,
                     decode_weights: Optional[str] = None
                     ) -> Tuple[jax.Array, jax.Array]:
    """Beam decode for S2VT (cell math identical to s2vt.decode's eval scan)."""
    enc_outs, state1 = s2vt.encode(params, spec, vid_feats)
    return s2vt_beam_from_states(params, spec, enc_outs, state1, beam_size,
                                 eos_id, decode_weights=decode_weights)


# ---------------------------------------------------------------- S2VT-att

def _s2vt_att_stepper(params, spec: model_base.ModelSpec, pk: jax.Array,
                      eo: jax.Array, decode_weights: Optional[str] = None):
    """The S2VT-att decode cell closed over (possibly beam-tiled) projected
    keys pk and encoder outputs eo.

    ``decode_weights="int8"``: rnn w_ih/w_hh + the vocab projection stream
    as int8 (see _s2vt_stepper). The Bahdanau attention denses stay f32 —
    query/energy are byte-trivial (H x H and H x 1) and key_layer feeds the
    admission-time pk, whose f32 contract (serving_continuous) stays
    untouched."""
    dec = params["decoder"]
    dw = wquant_resolve(decode_weights)
    if dw == "int8":
        from vcr_tpu.ops import wquant

        dec = dict(dec, rnn=wquant.augment_gru(dec["rnn"]),
                   pred_linear=wquant.augment_dense(dec["pred_linear"]))

    def step_fn(state, words, i):
        del i
        context, _ = bahdanau_attend(dec["attention"], state["h"], pk, eo,
                                     spec.cdtype)
        emb = embed(dec["embedding"], words)
        x = jnp.concatenate([context, emb], axis=-1)
        if dw == "int8":
            from vcr_tpu.ops import wquant

            xg = wquant.gru_x_gates(dec["rnn"], x, spec.cdtype)
            h = gru_gates(xg, state["h"], dec["rnn"], spec.cdtype,
                          h_gates=wquant.gru_h_gates(dec["rnn"], state["h"],
                                                     spec.cdtype))
            logits = mask_vocab_pad(
                wquant.dense_aug(dec["pred_linear"], h, spec.cdtype),
                spec.vocab_size)
        else:
            xg = vdot(x, dec["rnn"]["w_ih"], spec.cdtype) + dec["rnn"]["b_ih"]
            h = gru_gates(xg, state["h"], dec["rnn"], spec.cdtype)
            logits = mask_vocab_pad(dense(dec["pred_linear"], h, spec.cdtype),
                                    spec.vocab_size)
        return {"h": h}, logits

    return step_fn


def s2vt_att_beam_from_states(params, spec: model_base.ModelSpec,
                              encoder_outs: jax.Array, encoder_final: jax.Array,
                              beam_size: int, eos_id: int,
                              decode_weights: Optional[str] = None
                              ) -> Tuple[jax.Array, jax.Array]:
    dec = params["decoder"]
    proj_key = bahdanau_project_keys(dec["attention"], encoder_outs, spec.cdtype)
    b = encoder_outs.shape[0]

    # eo is only ever consumed through bahdanau_attend's values.astype(cdtype)
    # cast — tile/read the stream at cdtype (bit-identical, halves the
    # per-step HBM read at bf16)
    tiled = _tile_beam({"h": encoder_final, "pk": proj_key,
                        "eo": encoder_outs.astype(spec.cdtype)},
                       beam_size)
    step_fn = _s2vt_att_stepper(params, spec, tiled["pk"], tiled["eo"],
                                decode_weights=decode_weights)
    return beam_search(step_fn, {"h": tiled["h"]}, b, beam_size, spec.max_len,
                       spec.sos_id, eos_id)


def s2vt_att_sample_from_states(params, spec: model_base.ModelSpec,
                                encoder_outs: jax.Array,
                                encoder_final: jax.Array, rng: jax.Array,
                                eos_id: int, temperature: float = 1.0,
                                top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    proj_key = bahdanau_project_keys(params["decoder"]["attention"],
                                     encoder_outs, spec.cdtype)
    step_fn = _s2vt_att_stepper(params, spec, proj_key,
                                encoder_outs.astype(spec.cdtype))
    return sample_search(step_fn, {"h": encoder_final}, encoder_outs.shape[0],
                         spec.max_len, spec.sos_id, eos_id, rng,
                         temperature, top_k, top_p)


def s2vt_att_beam_decode(params, spec: model_base.ModelSpec, vid_feats: jax.Array,
                         beam_size: int, eos_id: int,
                         decode_weights: Optional[str] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    encoder_outs, encoder_final = s2vt_att.encode(params, spec, vid_feats)
    return s2vt_att_beam_from_states(params, spec, encoder_outs, encoder_final,
                                     beam_size, eos_id,
                                     decode_weights=decode_weights)


# ------------------------------------------------ RationaleNet / SpatialNet

def rationale_beam_decode(params, spec: model_base.ModelSpec,
                          vid_feats: jax.Array, beam_size: int, eos_id: int,
                          rng=None, decode_weights: Optional[str] = None
                          ) -> Tuple[jax.Array, jax.Array]:
    """Hard Gumbel frame selection (eval mode), then beam on the wrapped
    captioner over the masked features (RationaleNet.py:103-104)."""
    from vcr_tpu.models import rationale

    if rng is None:
        rng = jax.random.PRNGKey(0)
    sel, _probs = rationale.generator(params["gen"], spec,
                                      vid_feats.astype(spec.cdtype), rng,
                                      train=False)
    cap = params["caption_net"]
    if spec.base_arch == "s2vt":
        return s2vt_beam_decode(cap, spec, sel, beam_size, eos_id,
                                decode_weights=decode_weights)
    return s2vt_att_beam_decode(cap, spec, sel, beam_size, eos_id,
                                decode_weights=decode_weights)


def spatial_beam_decode(params, spec: model_base.ModelSpec,
                        vid_feats: jax.Array, beam_size: int, eos_id: int,
                        decode_weights: Optional[str] = None
                        ) -> Tuple[jax.Array, jax.Array]:
    """Spatial-attention encode, then beam on the wrapped captioner's decoder
    (SpatialNet.py:140)."""
    from vcr_tpu.models import spatial

    output1, rnn_state, _alphas, _bn = spatial.encode_spatial(
        params, spec, vid_feats, train=False)
    cap = params["caption_net"]
    if spec.base_arch == "s2vt":
        return s2vt_beam_from_states(cap, spec, output1, rnn_state,
                                     beam_size, eos_id,
                                     decode_weights=decode_weights)
    return s2vt_att_beam_from_states(cap, spec,
                                     jnp.transpose(output1, (1, 0, 2)),
                                     rnn_state, beam_size, eos_id,
                                     decode_weights=decode_weights)


# ---------------------------------------------------------------- Transformer

def transformer_beam_decode(params, spec: model_base.ModelSpec,
                            vid_feats: jax.Array, beam_size: int,
                            eos_id: int) -> Tuple[jax.Array, jax.Array]:
    """Beam decode for the Transformer. Each step re-runs the full decoder
    stack on the padded prefix with the reference's sqrt(prefix_len) PE scale
    (see models/transformer.py — a KV cache would be math-incorrect here).
    The per-beam token history rides in the search state so beam reordering
    keeps prefixes consistent."""
    import numpy as np

    from vcr_tpu.models import transformer as tr
    from vcr_tpu.nn.layers import torch_norm

    src_mask = tr.create_masks_inp(vid_feats)
    e_outputs = tr.encode(params, spec, vid_feats, src_mask,
                          jax.random.PRNGKey(0), train=False)
    b = vid_feats.shape[0]
    l = spec.max_len
    tiled = _tile_beam({"eo": e_outputs, "sm": src_mask}, beam_size)
    eo, sm = tiled["eo"], tiled["sm"]
    causal = jnp.asarray(np.triu(np.ones((l, l)), k=1) == 0)[None, None]
    dec = params["decoder"]
    dummy_key = jax.random.PRNGKey(0)

    init_state = {"outputs": jnp.zeros((b * beam_size, l), dtype=jnp.int32)}

    def step_fn(state, words, i):
        # prefix = [sos, w0..w_{i-1}]: words is the previous step's pick
        # (sos at i=0), written at position i
        outputs = jax.lax.dynamic_update_index_in_dim(
            state["outputs"], words, i, axis=1)
        x = embed(dec["embedding"], outputs)
        x = tr._apply_pe(dec["pe"], x, i + 1)

        def layer(p, h, k, e, s, t):
            return tr._decoder_layer(p, h, e, s, t, k, spec.tf_heads,
                                     train=False, cdtype=spec.cdtype)

        h = tr._run_stack(layer, dec["layers"], x, dummy_key, spec.tf_layers,
                          eo, sm, causal)
        h = torch_norm(dec["norm_out"], h)
        h_i = jax.lax.dynamic_slice_in_dim(h, i, 1, axis=1)[:, 0]
        logits = mask_vocab_pad(dense(dec["pred_linear"], h_i, spec.cdtype),
                                spec.vocab_size)
        return {"outputs": outputs}, logits

    return beam_search(step_fn, init_state, b, beam_size, spec.max_len,
                       spec.sos_id, eos_id)


def transformer_beam_decode_fast(params, spec: model_base.ModelSpec,
                                 vid_feats: jax.Array, beam_size: int,
                                 eos_id: int, lineage: bool = False,
                                 kv_cache: Optional[str] = None,
                                 decode_weights: Optional[str] = None
                                 ) -> Tuple[jax.Array, jax.Array]:
    """KV-cached beam decode — the SERVING beam path, ~L× fewer decoder FLOPs
    per step than transformer_beam_decode. Beams fold into the batch axis and
    the per-row self-attention caches ride in the search state. Same
    documented PE-scale deviation as decode_greedy_fast: each token keeps the
    sqrt(i+1) scale from its emission step. beam_size=1 reproduces
    decode_greedy_fast token-for-token up to the first eos (finished beams
    clamp to eos; the greedy decoder free-runs past it).

    lineage=False (default): textbook bookkeeping — every cache leaf is
    physically permuted by the beam reorder each step. Proven against the
    parity beam and greedy decoders; this is the path whose tokens the rest
    of the suite anchors on, so it is the serving default (VERDICT r3 #1).

    lineage=True (opt-in, low-traffic): caches are written once and never
    physically permuted; beam reordering re-indexes a (rows, L) ancestry
    matrix that self-attention reads through (transformer.
    make_cached_stepper). Its ancestry BOOKKEEPING is proven bit-exact on
    the MXU (tpu_checks "lineage bookkeeping ≡ physical reorder";
    tests/test_lineage_bookkeeping.py) — both attention reads are true
    gathers, never one-hot matmuls, and the context reduction order is
    ancestry-independent. What is NOT bit-equal to this gather path is the
    attention DOT SHAPE (`bthjs` vs `bhqk`): two different contractions
    differ at f32 ulp on the MXU, which one bf16 cast amplifies to a
    one-quantum logit gap, so tokens may differ on near-ties (~2-4% of
    steps at bf16; bit-identical at fp32 on CPU only by accident of toy
    sizes — onchip_r4/tpu_checks.log forensics). tpu_checks bounds the
    lockstep logit envelope instead of demanding identity. Choose it when
    beam-step HBM traffic dominates (it removes the per-step cache
    read+write — scripts/analyze_beam_paths.py) and near-tie-invariant
    tokens are not required."""
    from vcr_tpu.models import transformer as tr

    src_mask = tr.create_masks_inp(vid_feats)
    e_outputs = tr.encode(params, spec, vid_feats, src_mask,
                          jax.random.PRNGKey(0), train=False)
    b = vid_feats.shape[0]
    # Untiled e_outputs: the stepper projects cross K/V once per video and
    # repeats per beam afterwards (beam_size× fewer 4096-wide matmuls). Its
    # per-layer cache leaves are rows-leading, so the default reorder works.
    if lineage:
        step_fn, init_state, reorder_fn = tr.make_cached_stepper(
            params, spec, e_outputs, beam_tile=beam_size, lineage=True,
            kv_cache=kv_cache, decode_weights=decode_weights)
    else:
        step_fn, init_state = tr.make_cached_stepper(params, spec, e_outputs,
                                                     beam_tile=beam_size,
                                                     kv_cache=kv_cache,
                                                     decode_weights=decode_weights)
        reorder_fn = None
    return beam_search(step_fn, init_state, b, beam_size, spec.max_len,
                       spec.sos_id, eos_id, reorder_fn=reorder_fn)


def transformer_sample_decode(params, spec: model_base.ModelSpec,
                              vid_feats: jax.Array, rng: jax.Array,
                              eos_id: int, temperature: float = 1.0,
                              top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """Sampling decode for the Transformer through the KV-cached serving
    stepper (sampling is inherently non-parity, so the fast cell — with its
    documented per-token PE-scale semantics — is the right one; top_k=1
    reproduces decode_greedy_fast token-for-token up to the first eos —
    finished rows clamp to eos afterwards while greedy free-runs)."""
    from vcr_tpu.models import transformer as tr

    src_mask = tr.create_masks_inp(vid_feats)
    e_outputs = tr.encode(params, spec, vid_feats, src_mask,
                          jax.random.PRNGKey(0), train=False)
    step_fn, init_state = tr.make_cached_stepper(params, spec, e_outputs)
    return sample_search(step_fn, init_state, vid_feats.shape[0],
                         spec.max_len, spec.sos_id, eos_id, rng,
                         temperature, top_k, top_p)


def sample_tokens(params, spec: model_base.ModelSpec, vid_feats, eos_id: int,
                  rng, temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 0.0):
    """Unified stochastic-decoding entry for ALL FIVE families (beyond the
    reference's greedy-only surface; the decode_tokens analogue). top_k=1 is
    deterministic argmax — equal to the family's greedy decode (for the
    Transformer: to decode_greedy_fast); a vanishing top_p nucleus is too.
    RationaleNet splits ``rng`` into a frame-selection key and a sampling
    key."""
    if spec.arch == "s2vt":
        return s2vt_sample_decode(params, spec, vid_feats, rng, eos_id,
                                  temperature, top_k, top_p)
    if spec.arch == "s2vt-att":
        eo, ef = s2vt_att.encode(params, spec, vid_feats)
        return s2vt_att_sample_from_states(params, spec, eo, ef, rng, eos_id,
                                           temperature, top_k, top_p)
    if spec.arch == "transformer":
        return transformer_sample_decode(params, spec, vid_feats, rng, eos_id,
                                         temperature, top_k, top_p)
    if spec.arch == "rationale":
        from vcr_tpu.models import rationale

        k_gen, k_samp = jax.random.split(rng)
        sel, _probs = rationale.generator(params["gen"], spec,
                                          vid_feats.astype(spec.cdtype),
                                          k_gen, train=False)
        cap = params["caption_net"]
        base_spec = spec.with_(arch=spec.base_arch)
        return sample_tokens(cap, base_spec, sel, eos_id, k_samp,
                             temperature, top_k, top_p)
    if spec.arch == "spatial":
        from vcr_tpu.models import spatial

        output1, rnn_state, _alphas, _bn = spatial.encode_spatial(
            params, spec, vid_feats, train=False)
        cap = params["caption_net"]
        if spec.base_arch == "s2vt":
            return s2vt_sample_from_states(cap, spec, output1, rnn_state, rng,
                                           eos_id, temperature, top_k, top_p)
        return s2vt_att_sample_from_states(cap, spec,
                                           jnp.transpose(output1, (1, 0, 2)),
                                           rnn_state, rng, eos_id,
                                           temperature, top_k, top_p)
    raise NotImplementedError(f"sampling decode for {spec.arch}")


def augment_decode_weights(params, spec: model_base.ModelSpec):
    """Pre-quantize (W8, ops/wquant.py) the per-tick decode weights of ANY
    family's params tree — the serving pool's one-time init form, so its
    jitted tick streams int8 weight args instead of re-quantizing f32
    weights in-trace every call. GRU families get AUGMENTED dicts (codes
    next to the f32 originals; encode paths keep reading the originals, so
    ONE tree serves both the encode and step graphs — live pool and frozen
    artifact alike); the transformer replaces its decoder denses
    (transformer.quantize_decoder_params). Idempotent."""
    from vcr_tpu.ops import wquant

    def aug_base(p, arch):
        if arch == "s2vt":
            return dict(p, rnn1=wquant.augment_gru(p["rnn1"]),
                        rnn2=wquant.augment_gru(p["rnn2"]),
                        linear=wquant.augment_dense(p["linear"]))
        dec = p["decoder"]
        return dict(p, decoder=dict(
            dec, rnn=wquant.augment_gru(dec["rnn"]),
            pred_linear=wquant.augment_dense(dec["pred_linear"])))

    if spec.arch == "transformer":
        from vcr_tpu.models import transformer as tr

        return tr.quantize_decoder_params(params)
    if spec.arch in ("spatial", "rationale"):
        return dict(params, caption_net=aug_base(params["caption_net"],
                                                 spec.base_arch))
    return aug_base(params, spec.arch)


def decode_tokens(params, spec: model_base.ModelSpec, vid_feats, eos_id: int,
                  beam_size: int = 1, rng=None,
                  decode_weights: Optional[str] = None):
    """Unified entry for the captioners: beam_size=1's best row equals the
    greedy rollout token-for-token up to the first eos. ``rng`` seeds eval-time stochasticity
    (only RationaleNet's hard-Gumbel frame selection uses it; torch draws
    fresh noise per eval forward, F.gumbel_softmax in RationaleNet.py:50).

    ``decode_weights="int8"`` (GRU families + their spatial/rationale
    wrappers): W8 decode weights through the family steppers — the batch
    counterpart of the serving pool's mode. The transformer's parity beam
    re-runs the full stack and has no stepper to quantize — use
    transformer_beam_decode_fast(decode_weights=...) for its W8 form."""
    if spec.arch == "s2vt":
        return s2vt_beam_decode(params, spec, vid_feats, beam_size, eos_id,
                                decode_weights=decode_weights)
    if spec.arch == "s2vt-att":
        return s2vt_att_beam_decode(params, spec, vid_feats, beam_size,
                                    eos_id, decode_weights=decode_weights)
    if spec.arch == "transformer":
        if wquant_resolve(decode_weights) != "bf16":
            raise NotImplementedError(
                "decode_tokens runs the transformer's reference-parity beam "
                "(full-stack re-run, no stepper); use "
                "transformer_beam_decode_fast(decode_weights=...) for W8")
        return transformer_beam_decode(params, spec, vid_feats, beam_size, eos_id)
    if spec.arch == "rationale":
        return rationale_beam_decode(params, spec, vid_feats, beam_size, eos_id,
                                     rng=rng, decode_weights=decode_weights)
    if spec.arch == "spatial":
        return spatial_beam_decode(params, spec, vid_feats, beam_size, eos_id,
                                   decode_weights=decode_weights)
    raise NotImplementedError(f"beam decode for {spec.arch}")
