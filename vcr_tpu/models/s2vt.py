"""S2VT: Sequence-to-Sequence Video-to-Text (Venugopalan et al., arXiv 1505.00487).

TPU-native rebuild of reference model/S2VTModel.py:12-202. Architecture:

* encode: GRU1 over the N frame features (S2VTModel.py:74-86). One fused
  lax.scan with the frame->gates projection done as a single MXU matmul.
* prime: GRU2 run over [enc_out ; zero-word-pad] for all N steps, keeping only
  its final state (S2VTModel.py:103-107).
* decode: L steps where GRU1 sees a zero "video" input (its input gates are
  therefore the constant b_ih — computed once, not per step) and GRU2 sees
  [GRU1 out ; word embedding]; linear -> vocab logits (S2VTModel.py:121-136).
  The reference's per-token Python loop becomes one lax.scan; scheduled
  sampling's one-coin-per-batch-step random.random() (S2VTModel.py:134) becomes
  one Bernoulli draw per scan step from a threaded PRNG key.

Greedy eval decode (S2VTModel.py:148-177) is the same scan with teacher_force
probability 0 and dropout off — bitwise deterministic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vcr_tpu.models import base
from vcr_tpu.nn.layers import (dense, dense_init, dropout, embed, embedding_init,
                               mask_vocab_pad, vdot)
from vcr_tpu.nn.rnn import gru_gates, gru_init, gru_sequence


def init_params(key: jax.Array, spec: base.ModelSpec, glove_vectors) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embedding": embedding_init(glove_vectors, spec.padded_vocab_size),
        "rnn1": gru_init(k1, spec.vid_feat_size, spec.hidden_size),
        "rnn2": gru_init(k2, spec.hidden_size + spec.embed_size, spec.hidden_size),
        "linear": dense_init(k3, spec.hidden_size, spec.padded_vocab_size),
    }


def encode(params, spec: base.ModelSpec, vid_feats: jax.Array):
    """vid_feats (B, N, V) -> (enc_outs (N, B, H), state1 (B, H))."""
    xs = jnp.transpose(vid_feats, (1, 0, 2))
    if spec.use_pallas:
        from vcr_tpu.ops.pallas_gru import gru_sequence_pallas

        return gru_sequence_pallas(params["rnn1"], xs, compute_dtype=spec.cdtype)
    return gru_sequence(params["rnn1"], xs, compute_dtype=spec.cdtype)


def encode_step(params, spec: base.ModelSpec, vid_feat: jax.Array, state: jax.Array):
    """Single encoder step (B, V) x (B, H) -> (out (B, H), state (B, H)).
    Used by SpatialNet to splice spatially-attended contexts into the encoder
    (reference: S2VTModel.py:57-72, SpatialNet.py:127)."""
    xg = vdot(vid_feat, params["rnn1"]["w_ih"], spec.cdtype) + params["rnn1"]["b_ih"]
    h = gru_gates(xg, state, params["rnn1"], spec.cdtype)
    return h, h


def _prime_state2(params, spec: base.ModelSpec, enc_outs: jax.Array) -> jax.Array:
    """Run GRU2 over [enc_outs ; zero word embeddings], keep final state
    (reference: S2VTModel.py:103-107). The zero word-embedding half contributes
    nothing to the input projection, so only the first H rows of W_ih are
    multiplied — math-identical, ~40% fewer prime-phase FLOPs."""
    rnn2 = params["rnn2"]
    sliced = dict(rnn2)
    sliced["w_ih"] = rnn2["w_ih"][: spec.hidden_size]
    if spec.use_pallas:
        from vcr_tpu.ops.pallas_gru import gru_sequence_pallas

        _, state2 = gru_sequence_pallas(sliced, enc_outs, compute_dtype=spec.cdtype)
    else:
        _, state2 = gru_sequence(sliced, enc_outs, compute_dtype=spec.cdtype)
    return state2


def decode(
    params,
    spec: base.ModelSpec,
    enc_outs: jax.Array,       # (N, B, H)
    state1: jax.Array,         # (B, H)
    s: Optional[jax.Array],    # (B, L) teacher tokens, or None at eval
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,
    emit: str = "logits",      # "logits" (B, L, V) | "tokens" (B, L) int32 —
    #                            tokens skips materializing the logits tensor
    #                            (saves B*L*V HBM writes on the serving path)
) -> jax.Array:
    """-> logits (B, L, vocab) or greedy tokens (B, L). One lax.scan."""
    state2 = _prime_state2(params, spec, enc_outs)
    return decode_from_states(params, spec, state1, state2, s, rng=rng,
                              train=train, teacher_force_prob=teacher_force_prob,
                              emit=emit)


def decode_from_states(
    params,
    spec: base.ModelSpec,
    state1: jax.Array,         # (B, H)
    state2: jax.Array,         # (B, H) primed GRU2 state
    s: Optional[jax.Array],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,
    emit: str = "logits",
) -> jax.Array:
    b = state1.shape[0]

    # GRU1's decode-phase input is a zero frame, so its input gates are the
    # constant bias — hoisted out of the scan (S2VTModel.py:122 feeds zeros).
    xg1 = jnp.broadcast_to(params["rnn1"]["b_ih"], (b, 3 * spec.hidden_size))

    sos = jnp.full((b,), spec.sos_id, dtype=jnp.int32)
    if train:
        assert s is not None
        s_in = jnp.concatenate([sos[:, None], s.astype(jnp.int32)], axis=1)  # (B, L+1)
    else:
        s_in = jnp.zeros((b, spec.max_len + 1), dtype=jnp.int32)  # unused

    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_keys = jax.random.split(rng, spec.max_len)

    # Static full teacher forcing (the default schedule): uniform() draws lie
    # in [0, 1) so `uniform < 1.0` is always true — the argmax feedback is
    # dead and the logits never enter the recurrence. TPU-first: the scan
    # emits only the (B, H) GRU2 states; the vocab projection — the dominant
    # decode matmul — and its dropout run AFTER the scan as ONE (L·B, H) @
    # (H, V) MXU matmul, with embedding gathers + their dropout hoisted ahead
    # of it. Bit-identical to the per-step form: matmul rows are independent
    # and the per-step PRNG keys are reproduced exactly (k_tf is drawn but
    # unused, same as the dead `where` in the general path).
    if (train and isinstance(teacher_force_prob, (int, float))
            and float(teacher_force_prob) >= 1.0):
        keys3 = jax.vmap(lambda k: jax.random.split(k, 3))(step_keys)
        k_demb, k_dlin = keys3[:, 1], keys3[:, 2]
        embs = embed(params["embedding"], s_in[:, : spec.max_len])  # (B, L, E)
        embs = jnp.transpose(embs, (1, 0, 2))                       # (L, B, E)
        embs = jax.vmap(
            lambda k, e: dropout(k, e, spec.dropout_p, True))(k_demb, embs)

        def step_tf(carry, emb_t):
            st1, st2 = carry
            out1 = gru_gates(xg1, st1, params["rnn1"], spec.cdtype)
            x2 = jnp.concatenate([out1, emb_t], axis=-1)
            xg2 = (vdot(x2, params["rnn2"]["w_ih"], spec.cdtype)
                   + params["rnn2"]["b_ih"])
            out2 = gru_gates(xg2, st2, params["rnn2"], spec.cdtype)
            return (out1, out2), out2

        _, outs2 = jax.lax.scan(step_tf, (state1, state2), embs)   # (L, B, H)
        dropped = jax.vmap(
            lambda k, x: dropout(k, x, spec.dropout_p, True))(k_dlin, outs2)
        logits = mask_vocab_pad(
            dense(params["linear"], dropped, spec.cdtype), spec.vocab_size)
        return jnp.transpose(logits, (1, 0, 2))                    # (B, L, V)

    tf_prob = jnp.asarray(teacher_force_prob, dtype=jnp.float32)

    def step(carry, inp):
        st1, st2, words = carry
        i, key = inp
        k_tf, k_demb, k_dlin = jax.random.split(key, 3)

        out1 = gru_gates(xg1, st1, params["rnn1"], spec.cdtype)            # (B, H)
        emb = embed(params["embedding"], words)                             # (B, E)
        emb = dropout(k_demb, emb, spec.dropout_p, train)
        x2 = jnp.concatenate([out1, emb], axis=-1)
        xg2 = vdot(x2, params["rnn2"]["w_ih"], spec.cdtype) + params["rnn2"]["b_ih"]
        out2 = gru_gates(xg2, st2, params["rnn2"], spec.cdtype)             # (B, H)
        logits_t = mask_vocab_pad(
            dense(params["linear"], dropout(k_dlin, out2, spec.dropout_p, train),
                  spec.cdtype),
            spec.vocab_size)                                                # (B, V)

        next_words = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
        ys = next_words if emit == "tokens" else logits_t
        if train:
            # one coin per batch-step, as in the reference (S2VTModel.py:134-136)
            use_teacher = jax.random.uniform(k_tf, ()) < tf_prob
            next_words = jnp.where(use_teacher, s_in[:, i + 1], next_words)
        return (out1, out2, next_words), ys

    init_carry = (state1, state2, s_in[:, 0] if train else sos)
    xs = (jnp.arange(spec.max_len), step_keys)
    _, out = jax.lax.scan(step, init_carry, xs)
    if emit == "tokens":
        return jnp.transpose(out, (1, 0))    # (B, L) int32
    return jnp.transpose(out, (1, 0, 2))     # (B, L, V)


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
    """Full forward (reference: S2VTModel.forward, S2VTModel.py:179-202)."""
    del s_len  # S2VT ignores lengths in the forward pass
    # feed features at compute precision: halves the HBM stream into the
    # encoder's input projection (no-op in float32 parity mode)
    vid_feats = vid_feats.astype(spec.cdtype)
    # (a transpose-free batch-major pallas path exists —
    # ops.pallas_gru.gru_sequence_pallas_bt — but its strided 2D block DMA
    # measured slower than transposing + time-major streaming, so encode()
    # keeps the time-major kernel)
    enc_outs, state1 = encode(params, spec, vid_feats)
    return decode(params, spec, enc_outs, state1, s,
                  rng=rng, train=train, teacher_force_prob=teacher_force_prob,
                  emit=emit)


base.register("s2vt", init_params, apply)
