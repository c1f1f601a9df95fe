"""The hand-scheduled backward of the s2vt-att teacher-forced decode scan
(s2vt_att._attention_scan, VERDICT r3 #3) must be a drop-in for autodiff:
identical forward bits, gradients equal to the naive-scan autodiff to fp
tolerance, for every differentiable input, at fp32 and bf16, composed with
jax.checkpoint (the --remat path) and with the full model loss."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import base, s2vt_att


def _naive(qv, rnn, proj_key, values, h0, embs, cdt):
    """The plain autodiff reference: the same stage functions, scanned."""
    def step(state, emb_t):
        scores = s2vt_att._att_scores(qv, state, proj_key, cdt)
        context, _ = s2vt_att._att_context(scores, values, cdt)
        state = s2vt_att._gru_in(rnn, context, emb_t, state, cdt)
        return state, state

    _, states = jax.lax.scan(step, h0, embs)
    return states


def _inputs(rng, b=4, n=5, h=16, e=8, l=6, dtype=np.float32):
    from vcr_tpu.nn.attention import bahdanau_init
    from vcr_tpu.nn.rnn import gru_init

    att = bahdanau_init(jax.random.PRNGKey(0), h)
    qv = {"query_layer": att["query_layer"],
          "energy_layer": att["energy_layer"]}
    rnn = gru_init(jax.random.PRNGKey(1), h + e, h)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)  # noqa: E731
    return qv, rnn, r(b, n, h), r(b, n, h), r(b, h), r(l, b, e)


@pytest.mark.parametrize("cdt_name,tol", [("float32", 5e-6),
                                          ("bfloat16", 5e-3)])
def test_grads_match_autodiff(rng, cdt_name, tol):
    cdt = jnp.dtype(cdt_name)
    qv, rnn, pk, vals, h0, embs = _inputs(rng)
    w = jnp.asarray(rng.standard_normal((6, 4, 16)), jnp.float32)

    def loss_custom(qv, rnn, pk, vals, h0, embs):
        s = s2vt_att._attention_scan(cdt_name, qv, rnn, pk, vals, h0, embs)
        return jnp.sum(s * w)

    def loss_naive(qv, rnn, pk, vals, h0, embs):
        return jnp.sum(_naive(qv, rnn, pk, vals, h0, embs, cdt) * w)

    # forward: the custom fwd is literally the same scan — bit-identical
    np.testing.assert_array_equal(
        np.asarray(s2vt_att._attention_scan(cdt_name, qv, rnn, pk, vals,
                                            h0, embs)),
        np.asarray(_naive(qv, rnn, pk, vals, h0, embs, cdt)))

    g_c = jax.jit(jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4, 5)))(
        qv, rnn, pk, vals, h0, embs)
    g_n = jax.jit(jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4, 5)))(
        qv, rnn, pk, vals, h0, embs)
    flat_c, tree_c = jax.tree_util.tree_flatten(g_c)
    flat_n, tree_n = jax.tree_util.tree_flatten(g_n)
    assert tree_c == tree_n
    for a, b, path in zip(flat_c, flat_n,
                          jax.tree_util.tree_leaves_with_path(g_c)):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            atol=tol * scale, rtol=0,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path[0])}")


def test_composes_with_checkpoint(rng):
    """--remat wraps the forward in jax.checkpoint; the custom VJP must
    survive rematerialization (recomputed fwd + custom bwd)."""
    qv, rnn, pk, vals, h0, embs = _inputs(rng)

    def loss(qv, rnn, pk, vals, h0, embs):
        s = s2vt_att._attention_scan("float32", qv, rnn, pk, vals, h0, embs)
        return jnp.sum(s ** 2)

    g_plain = jax.jit(jax.grad(loss, argnums=(2, 4)))(qv, rnn, pk, vals,
                                                      h0, embs)
    g_remat = jax.jit(jax.grad(jax.checkpoint(loss), argnums=(2, 4)))(
        qv, rnn, pk, vals, h0, embs)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_full_model_grads_match(rng, tiny_vocab, monkeypatch):
    """End-to-end: grads of the real masked-CE training loss through the
    whole s2vt-att model, custom VJP vs VCR_ATT_SCAN=autodiff."""
    from vcr_tpu.train import step as step_mod

    spec = base.ModelSpec(
        arch="s2vt-att", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size,
        hidden_size=12, vid_feat_size=10, max_len=5, num_frames=4,
        dropout_p=0.5, sos_id=tiny_vocab.sos_id, compute_dtype="float32")
    init_fn, apply_fn = base.build_model("s2vt-att")
    params = init_fn(jax.random.PRNGKey(2), spec, tiny_vocab.vectors)
    batch = {
        "vid_feats": jnp.asarray(rng.standard_normal((6, 4, 10)),
                                 jnp.float32),
        "sent": jnp.asarray(rng.integers(0, tiny_vocab.vocab_size, (6, 5)),
                            jnp.int32),
        "sent_len": jnp.asarray([5, 4, 3, 5, 2, 4], jnp.int32),
        "valid": jnp.ones((6,), jnp.float32),
    }

    def fwd(p, vid_feats, sent, sent_len, key, tf_prob):
        return apply_fn(p, spec, vid_feats, sent, sent_len, rng=key,
                        train=True, teacher_force_prob=tf_prob)

    def loss(p):
        l, *_ = step_mod._forward("s2vt-att", fwd, p, batch,
                                  jax.random.PRNGKey(3), 1.0, 1.0, 1.0)
        return l

    g_custom = jax.jit(jax.grad(loss))(params)
    monkeypatch.setenv("VCR_ATT_SCAN", "autodiff")
    g_auto = jax.jit(jax.grad(loss))(params)
    for a, b, path in zip(jax.tree_util.tree_leaves(g_custom),
                          jax.tree_util.tree_leaves(g_auto),
                          jax.tree_util.tree_leaves_with_path(g_custom)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path[0])}")
