"""Hoisted teacher-forced decode == the general per-step path, bit-for-bit.

At train time with full teacher forcing the logits never feed back into the
recurrence, so the decode scans emit only GRU states and the vocab projection
(+ dropout) runs after the scan as one (L*B, H) @ (H, V) matmul
(s2vt.decode_from_states / s2vt_att.decode).

Oracles:
- s2vt specializes only on a STATIC teacher_force_prob >= 1.0 (uniform() in
  [0, 1) is always < 1.0, so the general path's argmax feedback is dead).
  Passing the same 1.0 as a traced jnp scalar keeps the general scan path —
  a built-in differential oracle, including for rationale/spatial wrappers.
- s2vt-att is ALWAYS teacher-forced at train (S2VTAttModel.py:188-191), so
  the general train path no longer exists; its oracle is an explicit per-step
  Python loop over the same primitives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vcr_tpu.models import base, rationale, s2vt, s2vt_att, spatial
from vcr_tpu.nn.attention import bahdanau_attend, bahdanau_project_keys
from vcr_tpu.nn.layers import dense, dropout, embed, mask_vocab_pad, vdot
from vcr_tpu.nn.rnn import gru_gates


def _spec(vocab, **kw):
    d = dict(arch="s2vt", vocab_size=vocab.vocab_size, embed_size=vocab.embed_size,
             hidden_size=8, vid_feat_size=12, max_len=5, num_frames=4,
             dropout_p=0.3, sos_id=vocab.sos_id, compute_dtype="float32",
             tau=1.0, base_arch="s2vt")
    d.update(kw)
    return base.ModelSpec(**d)


def _inputs(rng, b, spec, grid=False):
    shape = ((b, spec.num_frames, spec.vid_feat_size, 3, 3) if grid
             else (b, spec.num_frames, spec.vid_feat_size))
    vid = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    s = jnp.asarray(rng.integers(0, spec.vocab_size, (b, spec.max_len)),
                    dtype=jnp.int32)
    s_len = jnp.asarray(rng.integers(2, spec.max_len + 1, (b,)), dtype=jnp.int32)
    return vid, s, s_len


def _assert_same(a, b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_s2vt_hoisted_equals_general(tiny_vocab, rng):
    spec = _spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    vid, s, s_len = _inputs(rng, 3, spec)
    key = jax.random.PRNGKey(7)
    hoisted = s2vt.apply(params, spec, vid, s, s_len, rng=key, train=True,
                         teacher_force_prob=1.0)
    general = s2vt.apply(params, spec, vid, s, s_len, rng=key, train=True,
                         teacher_force_prob=jnp.float32(1.0))
    _assert_same(hoisted, general)


def test_rationale_hoisted_equals_general(tiny_vocab, rng):
    spec = _spec(tiny_vocab, arch="rationale")
    params = rationale.init_params(jax.random.PRNGKey(1), spec, tiny_vocab.vectors)
    vid, s, s_len = _inputs(rng, 3, spec)
    key = jax.random.PRNGKey(8)
    lh, ph = rationale.apply(params, spec, vid, s, s_len, rng=key, train=True,
                             teacher_force_prob=1.0)
    lg, pg = rationale.apply(params, spec, vid, s, s_len, rng=key, train=True,
                             teacher_force_prob=jnp.float32(1.0))
    _assert_same(lh, lg)
    _assert_same(ph, pg)


def test_spatial_hoisted_equals_general(tiny_vocab, rng):
    spec = _spec(tiny_vocab, arch="spatial")
    params = spatial.init_params(jax.random.PRNGKey(2), spec, tiny_vocab.vectors)
    vid, s, s_len = _inputs(rng, 2, spec, grid=True)
    key = jax.random.PRNGKey(9)
    lh, ah, _ = spatial.apply(params, spec, vid, s, s_len, rng=key, train=True,
                              teacher_force_prob=1.0)
    lg, ag, _ = spatial.apply(params, spec, vid, s, s_len, rng=key, train=True,
                              teacher_force_prob=jnp.float32(1.0))
    _assert_same(lh, lg)
    _assert_same(ah, ag)


def test_s2vt_att_hoisted_equals_per_step_loop(tiny_vocab, rng):
    spec = _spec(tiny_vocab, arch="s2vt-att")
    params = s2vt_att.init_params(jax.random.PRNGKey(3), spec, tiny_vocab.vectors)
    vid, s, _ = _inputs(rng, 3, spec)
    key = jax.random.PRNGKey(11)

    got = s2vt_att.apply(params, spec, vid, s, rng=key, train=True)

    # per-step oracle: the pre-hoist scan body, replayed in Python
    encoder_outs, state = s2vt_att.encode(params, spec, vid)
    dec = params["decoder"]
    proj_key = bahdanau_project_keys(dec["attention"], encoder_outs, spec.cdtype)
    sos = jnp.full((3,), spec.sos_id, dtype=jnp.int32)
    s_in = jnp.concatenate([sos[:, None], s.astype(jnp.int32)], axis=1)
    step_keys = jax.random.split(key, spec.max_len)
    logits = []
    for i in range(spec.max_len):
        context, _ = bahdanau_attend(dec["attention"], state, proj_key,
                                     encoder_outs, spec.cdtype)
        emb = embed(dec["embedding"], s_in[:, i])
        x = jnp.concatenate([context, emb], axis=-1)
        xg = vdot(x, dec["rnn"]["w_ih"], spec.cdtype) + dec["rnn"]["b_ih"]
        state = gru_gates(xg, state, dec["rnn"], spec.cdtype)
        logits.append(mask_vocab_pad(
            dense(dec["pred_linear"],
                  dropout(step_keys[i], state, spec.dropout_p, True),
                  spec.cdtype),
            spec.vocab_size))
    want = jnp.stack(logits, axis=1)
    _assert_same(got, want)


def test_step_fns_static_tf_matches_runtime_tf(tiny_vocab, rng):
    """build_step_fns(static_tf=1.0) — the training loop's default — produces
    the same update as the runtime-tf path under jit + grad + Adam."""
    from vcr_tpu.train.step import build_step_fns

    spec = _spec(tiny_vocab)
    params = s2vt.init_params(jax.random.PRNGKey(4), spec, tiny_vocab.vectors)
    vid, s, s_len = _inputs(rng, 4, spec)
    batch = {"vid_feats": vid, "sent": s, "sent_len": s_len,
             "valid": jnp.ones((4,), jnp.float32)}
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(12)

    outs = []
    for static_tf in (1.0, None):
        # deep-copy leaves: train_step donates params/opt_state buffers
        p0 = jax.tree_util.tree_map(jnp.array, params)
        step, _ = build_step_fns("s2vt", spec, opt, static_tf=static_tf)
        p, o, metrics, _ = step(p0, opt.init(p0), dict(batch), key, 1.0)
        outs.append((p, metrics["loss"]))
    (p_h, l_h), (p_g, l_g) = outs
    _assert_same(l_h, l_g)
    for a, b in zip(jax.tree_util.tree_leaves(p_h),
                    jax.tree_util.tree_leaves(p_g)):
        _assert_same(a, b)
