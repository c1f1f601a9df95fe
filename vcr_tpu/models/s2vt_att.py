"""S2VT with Bahdanau temporal attention.

TPU-native rebuild of reference model/S2VTAttModel.py:12-264:

* Encoder: single GRU over frames -> (encoder_outs (B, N, H), final (B, H))
  (S2VTAttModel.py:50-96).
* Decoder: init state = encoder final; W_k·keys precomputed once per sequence
  (S2VTAttModel.py:178); each step attends with the *previous* decoder state,
  feeds [context ; word embedding] to the GRU, then dropout+linear -> vocab
  (S2VTAttModel.py:125-148). Teacher forcing during training (always — this
  model has NO scheduled sampling, S2VTAttModel.py:188-191), greedy at eval.

The reference's per-token Python loop becomes one lax.scan; the attention MLP
is fused by XLA into the step.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.models import base
from vcr_tpu.nn.attention import bahdanau_attend, bahdanau_init, bahdanau_project_keys
from vcr_tpu.nn.layers import (dense, dense_init, dropout, embed, embedding_init,
                               mask_vocab_pad, vdot)
from vcr_tpu.nn.rnn import gru_gates, gru_init, gru_sequence


# --------------------------------------------------------------------------
# Teacher-forced attention-decode scan with a hand-scheduled backward.
#
# Autodiff of the naive scan is the round-2/3 MFU floor (VERDICT r3 #3,
# onchip_r3/diag_s2vt_att.log: backward ~6x the forward, superlinear in B):
# the scan closes over proj_key (B,N,H) and encoder_outs (B,N,H), so the
# TRANSPOSED scan (a) ping-pongs BOTH of their gradient accumulators through
# the backward carry every step (~4x(B,N,H) fp32 of HBM read+write per step)
# and (b) stores the (B,N,H) fp32 tanh energies of every step as the tape.
#
# This custom VJP keeps the forward byte-identical (same scan) and
# restructures only the backward:
#   * the reversed scan recomputes each step's attention on the fly (no
#     (B,N,H) tape) and carries ONLY (B,H)/param-sized cotangents;
#   * the two (B,N,H) gradients leave the scan as (B,N)/(B,H) per-step
#     factors (d_scores_t, alphas_t, d_context_t) and are reconstructed
#     OUTSIDE it by single batched contractions:
#         d_values   = sum_t alphas_t (x) d_context_t
#         d_proj_key = sum_t (1 - tanh^2_t) * (d_scores_t (x) v)
#     — one fused sweep each instead of L carry round-trips.
# Per-step gradient math is delegated to jax.vjp over the SAME stage
# functions the forward uses (correctness by construction); only the
# residual/accumulation schedule is manual. VCR_ATT_SCAN=autodiff restores
# plain autodiff for A/B.
# --------------------------------------------------------------------------


def _att_scores(qv, q, proj_key, cdt):
    """Bahdanau energies for one step: (B, H) query -> (B, N) scores."""
    qp = dense(qv["query_layer"], q, cdt)
    energy = jnp.tanh(qp[:, None, :] + proj_key)
    return dense(qv["energy_layer"], energy, cdt)[..., 0]


def _att_context(scores, values, cdt):
    alphas = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bn,bnd->bd", alphas.astype(cdt),
                         values.astype(cdt),
                         preferred_element_type=jnp.float32)
    return context, alphas


def _gru_in(rnn, context, emb, state, cdt):
    x = jnp.concatenate([context, emb], axis=-1)
    xg = vdot(x, rnn["w_ih"], cdt) + rnn["b_ih"]
    return gru_gates(xg, state, rnn, cdt)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attention_scan(cdtype_name, qv, rnn, proj_key, values, h0, embs):
    """Teacher-forced decode recurrence -> states (L, B, H).

    qv: {"query_layer", "energy_layer"} of the Bahdanau params (key_layer
    grads flow through proj_key, which is computed outside). embs: (L, B, E).
    """
    cdt = jnp.dtype(cdtype_name)

    def step(state, emb_t):
        scores = _att_scores(qv, state, proj_key, cdt)
        context, _ = _att_context(scores, values, cdt)
        state = _gru_in(rnn, context, emb_t, state, cdt)
        return state, state

    _, states = jax.lax.scan(step, h0, embs)
    return states


def _attention_scan_fwd(cdtype_name, qv, rnn, proj_key, values, h0, embs):
    states = _attention_scan(cdtype_name, qv, rnn, proj_key, values, h0, embs)
    return states, (qv, rnn, proj_key, values, h0, embs, states)


def _attention_scan_bwd(cdtype_name, res, d_states):
    cdt = jnp.dtype(cdtype_name)
    qv, rnn, proj_key, values, h0, embs, states = res
    # q_t (the state the step ATTENDS with) = state_{t-1}
    qs = jnp.concatenate([h0[None], states[:-1]], axis=0)        # (L, B, H)

    zero_qv = jax.tree_util.tree_map(jnp.zeros_like, qv)
    zero_rnn = jax.tree_util.tree_map(jnp.zeros_like, rnn)

    def back_step(carry, xs):
        d_state, d_qv, d_rnn = carry
        q_t, emb_t, d_state_ys = xs
        d_total = d_state + d_state_ys

        # recompute this step's attention (transient residuals only)
        scores_t, vjp_scores = jax.vjp(
            lambda qv_, q_: _att_scores(qv_, q_, proj_key, cdt), qv, q_t)
        (context_t, alphas_t), vjp_ctx = jax.vjp(
            lambda s_: _att_context(s_, values, cdt), scores_t)
        _, vjp_gru = jax.vjp(
            lambda rnn_, c_, e_, s_: _gru_in(rnn_, c_, e_, s_, cdt),
            rnn, context_t, emb_t, q_t)

        d_rnn_t, d_context, d_emb, d_state_gru = vjp_gru(d_total)
        d_scores, = vjp_ctx((d_context, jnp.zeros_like(alphas_t)))
        d_qv_t, d_q = vjp_scores(d_scores)

        carry = (d_state_gru + d_q,
                 jax.tree_util.tree_map(jnp.add, d_qv, d_qv_t),
                 jax.tree_util.tree_map(jnp.add, d_rnn, d_rnn_t))
        return carry, (d_scores, d_context, alphas_t, d_emb)

    (d_h0, d_qv, d_rnn), (d_scores_a, d_ctx_a, alphas_a, d_embs) = \
        jax.lax.scan(back_step, (jnp.zeros_like(h0), zero_qv, zero_rnn),
                     (qs, embs, d_states), reverse=True)

    # -------- batched reconstruction of the two (B, N, H) gradients --------
    # d_values: context einsum pullback, summed over steps (alphas cast to
    # cdt exactly as the forward did)
    d_values = jnp.einsum("tbn,tbd->bnd", alphas_a.astype(cdt),
                          d_ctx_a.astype(cdt),
                          preferred_element_type=jnp.float32
                          ).astype(values.dtype)
    # d_proj_key: tanh'/v pullback of the energy MLP, recomputed batched and
    # reduced over steps in one fused sweep (never materializing (L,B,N,H))
    qp_all = dense(qv["query_layer"], qs, cdt)                   # (L, B, H)
    # the forward ran scores = energy.astype(cdt) @ w.astype(cdt); mirror the
    # weight cast so d_energy matches autodiff's pullback values
    v_e = qv["energy_layer"]["w"][:, 0].astype(cdt).astype(jnp.float32)
    tanh_all = jnp.tanh(qp_all[:, :, None, :] + proj_key[None])  # (L,B,N,H)
    d_energy = (1.0 - tanh_all * tanh_all) * (
        d_scores_a[..., None].astype(jnp.float32) * v_e)
    d_pk = jnp.sum(d_energy, axis=0).astype(proj_key.dtype)      # (B, N, H)

    return d_qv, d_rnn, d_pk, d_values, d_h0, d_embs


_attention_scan.defvjp(_attention_scan_fwd, _attention_scan_bwd)


def init_params(key: jax.Array, spec: base.ModelSpec, glove_vectors) -> dict:
    k_enc, k_dec, k_att, k_lin = jax.random.split(key, 4)
    return {
        "encoder": {"rnn": gru_init(k_enc, spec.vid_feat_size, spec.hidden_size)},
        "decoder": {
            "embedding": embedding_init(glove_vectors, spec.padded_vocab_size),
            "rnn": gru_init(k_dec, spec.hidden_size + spec.embed_size, spec.hidden_size),
            "attention": bahdanau_init(k_att, spec.hidden_size),
            "pred_linear": dense_init(k_lin, spec.hidden_size, spec.padded_vocab_size),
        },
    }


def encode(params, spec: base.ModelSpec, vid_feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, N, V) -> (encoder_outs (B, N, H), encoder_final (B, H))."""
    xs = jnp.transpose(vid_feats, (1, 0, 2))
    if spec.use_pallas:
        from vcr_tpu.ops.pallas_gru import gru_sequence_pallas

        outs, final = gru_sequence_pallas(params["encoder"]["rnn"], xs,
                                          compute_dtype=spec.cdtype)
    else:
        outs, final = gru_sequence(params["encoder"]["rnn"], xs,
                                   compute_dtype=spec.cdtype)
    return jnp.transpose(outs, (1, 0, 2)), final


def encode_step(params, spec: base.ModelSpec, vid_feat: jax.Array, state: jax.Array):
    """Single encoder step, used by SpatialNet (S2VTAttModel.py:219-229)."""
    rnn = params["encoder"]["rnn"]
    xg = vdot(vid_feat, rnn["w_ih"], spec.cdtype) + rnn["b_ih"]
    h = gru_gates(xg, state, rnn, spec.cdtype)
    return h, h


def decode(
    params,
    spec: base.ModelSpec,
    encoder_outs: jax.Array,   # (B, N, H)
    encoder_final: jax.Array,  # (B, H)
    s: Optional[jax.Array],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,  # accepted for API symmetry; unused
    emit: str = "logits",      # "logits" (B, L, V) | "tokens" (B, L) int32 —
                               # tokens-only serving skips materializing the
                               # B*L*V logits tensor (same option as s2vt)
) -> jax.Array:
    """-> logits (B, L, vocab). One scan over decode steps (S2VTAttModel.py:182-191)."""
    del teacher_force_prob
    assert emit == "logits" or not train, "emit='tokens' is eval-only"
    dec = params["decoder"]
    b = encoder_outs.shape[0]
    proj_key = bahdanau_project_keys(dec["attention"], encoder_outs, spec.cdtype)

    sos = jnp.full((b,), spec.sos_id, dtype=jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_keys = jax.random.split(rng, spec.max_len)

    if train:
        # Teacher forcing is always on at train (S2VTAttModel.py:188-191), so
        # the logits never feed back into the recurrence. TPU-first: the scan
        # emits only the (B, H) GRU states and the vocab projection — the
        # dominant decode matmul — runs AFTER the scan as ONE
        # (L·B, H) @ (H, V) MXU matmul instead of L small ones, with the
        # word-embedding gathers hoisted likewise. Bit-identical to the
        # per-step form: matmul rows are independent and the per-step dropout
        # keys are reproduced exactly (vmapped over the same step_keys).
        assert s is not None
        s_in = jnp.concatenate([sos[:, None], s.astype(jnp.int32)], axis=1)
        embs = embed(dec["embedding"], s_in[:, : spec.max_len])  # (B, L, E)
        embs = jnp.transpose(embs, (1, 0, 2))                    # (L, B, E)

        qv = {"query_layer": dec["attention"]["query_layer"],
              "energy_layer": dec["attention"]["energy_layer"]}
        if os.environ.get("VCR_ATT_SCAN") == "autodiff":
            # plain-autodiff fall-back for A/B against the custom VJP
            def step_tf(state, emb_t):
                scores = _att_scores(qv, state, proj_key, spec.cdtype)
                context, _ = _att_context(scores, encoder_outs, spec.cdtype)
                state = _gru_in(dec["rnn"], context, emb_t, state, spec.cdtype)
                return state, state

            _, states = jax.lax.scan(step_tf, encoder_final, embs)
        else:
            states = _attention_scan(jnp.dtype(spec.cdtype).name, qv,
                                     dec["rnn"], proj_key, encoder_outs,
                                     encoder_final, embs)        # (L, B, H)
        dropped = jax.vmap(
            lambda k, x: dropout(k, x, spec.dropout_p, True))(step_keys, states)
        logits = mask_vocab_pad(
            dense(dec["pred_linear"], dropped, spec.cdtype), spec.vocab_size)
        return jnp.transpose(logits, (1, 0, 2))                  # (B, L, V)

    # Inference reads encoder_outs every decode step but only ever consumes
    # it through bahdanau_attend's values.astype(cdtype) cast — store the
    # stream at cdtype once instead, halving the dominant per-step HBM read
    # at bf16. Bit-identical: one f32->bf16 rounding either way. (Train is
    # untouched: its backward accumulates eo cotangents in f32.)
    encoder_outs = encoder_outs.astype(spec.cdtype)

    def step(carry, key):
        state, words = carry
        context, _ = bahdanau_attend(dec["attention"], state, proj_key, encoder_outs,
                                     spec.cdtype)
        emb = embed(dec["embedding"], words)
        x = jnp.concatenate([context, emb], axis=-1)
        xg = vdot(x, dec["rnn"]["w_ih"], spec.cdtype) + dec["rnn"]["b_ih"]
        state = gru_gates(xg, state, dec["rnn"], spec.cdtype)
        logits_t = mask_vocab_pad(
            dense(dec["pred_linear"], dropout(key, state, spec.dropout_p, train),
                  spec.cdtype),
            spec.vocab_size)
        next_words = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
        ys = next_words if emit == "tokens" else logits_t
        return (state, next_words), ys

    _, out = jax.lax.scan(step, (encoder_final, sos), step_keys)
    if emit == "tokens":
        return jnp.transpose(out, (1, 0))    # (B, L) int32
    return jnp.transpose(out, (1, 0, 2))


def apply(
    params,
    spec: base.ModelSpec,
    vid_feats: jax.Array,
    s: Optional[jax.Array] = None,
    s_len: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,
    emit: str = "logits",
) -> jax.Array:
    del s_len, teacher_force_prob
    vid_feats = vid_feats.astype(spec.cdtype)  # bf16 feed (fp32-mode no-op)
    encoder_outs, encoder_final = encode(params, spec, vid_feats)
    return decode(params, spec, encoder_outs, encoder_final, s, rng=rng,
                  train=train, emit=emit)


base.register("s2vt-att", init_params, apply)
