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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.models import base
from vcr_tpu.nn.attention import bahdanau_attend, bahdanau_init, bahdanau_project_keys
from vcr_tpu.nn.layers import (dense, dense_init, dropout, embed, embedding_init,
                               mask_vocab_pad, vdot)
from vcr_tpu.nn.rnn import gru_gates, gru_init, gru_sequence


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

        def step_tf(state, emb_t):
            context, _ = bahdanau_attend(dec["attention"], state, proj_key,
                                         encoder_outs, spec.cdtype)
            x = jnp.concatenate([context, emb_t], axis=-1)
            xg = vdot(x, dec["rnn"]["w_ih"], spec.cdtype) + dec["rnn"]["b_ih"]
            state = gru_gates(xg, state, dec["rnn"], spec.cdtype)
            return state, state

        _, states = jax.lax.scan(step_tf, encoder_final, embs)   # (L, B, H)
        dropped = jax.vmap(
            lambda k, x: dropout(k, x, spec.dropout_p, True))(step_keys, states)
        logits = mask_vocab_pad(
            dense(dec["pred_linear"], dropped, spec.cdtype), spec.vocab_size)
        return jnp.transpose(logits, (1, 0, 2))                  # (B, L, V)

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
