"""Pallas fused GRU sequence kernel vs the scan reference (interpret mode —
compiled-mode parity is exercised on real TPU by bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.nn import rnn
from vcr_tpu.ops.pallas_gru import gru_sequence_pallas


def test_pallas_gru_matches_scan(rng):
    t, b, i, h = 6, 8, 16, 128
    params = rnn.gru_init(jax.random.PRNGKey(0), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))
    ref_outs, ref_h = rnn.gru_sequence(params, xs, compute_dtype=jnp.float32)
    outs, h_last = gru_sequence_pallas(params, xs, compute_dtype=jnp.float32,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref_h), atol=1e-5)


def test_pallas_gru_batch_major_matches_scan(rng):
    t, b, i, h = 5, 8, 12, 128
    from vcr_tpu.ops.pallas_gru import gru_sequence_pallas_bt

    params = rnn.gru_init(jax.random.PRNGKey(2), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))
    ref_outs, ref_h = rnn.gru_sequence(params, xs, compute_dtype=jnp.float32)
    outs_bt, h_last = gru_sequence_pallas_bt(params, xs.transpose(1, 0, 2),
                                             compute_dtype=jnp.float32,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(outs_bt),
                               np.asarray(ref_outs.transpose(1, 0, 2)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref_h), atol=1e-5)


def test_pallas_gru_manual_dma_matches_scan(rng):
    from vcr_tpu.ops.pallas_gru import gru_sequence_pallas_dma

    t, b, i, h = 6, 16, 12, 128
    params = rnn.gru_init(jax.random.PRNGKey(3), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))
    ref_outs, ref_h = rnn.gru_sequence(params, xs, compute_dtype=jnp.float32)
    outs, h_last = gru_sequence_pallas_dma(params, xs, compute_dtype=jnp.float32,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref_h), atol=1e-5)


def test_pallas_gru_with_h0(rng):
    t, b, i, h = 4, 8, 8, 128
    params = rnn.gru_init(jax.random.PRNGKey(1), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    ref_outs, _ = rnn.gru_sequence(params, xs, h0, compute_dtype=jnp.float32)
    outs, _ = gru_sequence_pallas(params, xs, h0, compute_dtype=jnp.float32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs), atol=1e-5)


def test_pallas_lstm_matches_scan_both_directions(rng):
    from vcr_tpu.ops.pallas_gru import lstm_sequence_pallas

    t, b, i, h = 6, 8, 16, 128
    params = rnn.lstm_init(jax.random.PRNGKey(4), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))
    for reverse in (False, True):
        ref_outs, (ref_h, ref_c) = rnn.lstm_sequence(
            params, xs, reverse=reverse, compute_dtype=jnp.float32)
        outs, (h_last, c_last) = lstm_sequence_pallas(
            params, xs, reverse=reverse, compute_dtype=jnp.float32,
            interpret=True)
        np.testing.assert_allclose(np.asarray(outs), np.asarray(ref_outs),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref_h),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_last), np.asarray(ref_c),
                                   atol=1e-5)


def test_pallas_bilstm_matches_scan(rng):
    from vcr_tpu.ops.pallas_gru import bilstm_sequence_pallas

    t, b, i, h = 5, 8, 12, 128
    params = rnn.bilstm_init(jax.random.PRNGKey(5), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))
    ref = rnn.bilstm_sequence(params, xs, compute_dtype=jnp.float32)
    got = bilstm_sequence_pallas(params, xs, compute_dtype=jnp.float32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_gru_grad_matches_scan(rng):
    """use_pallas under jax.grad: the custom_vjp backward (pure-JAX recompute)
    must produce the same gradients as differentiating the scan directly."""
    t, b, i, h = 5, 8, 12, 128
    params = rnn.gru_init(jax.random.PRNGKey(6), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))

    def loss_pallas(p, x):
        outs, h_last = gru_sequence_pallas(p, x, compute_dtype=jnp.float32,
                                           interpret=True)
        return jnp.sum(outs ** 2) + jnp.sum(h_last)

    def loss_scan(p, x):
        outs, h_last = rnn.gru_sequence(p, x, compute_dtype=jnp.float32)
        return jnp.sum(outs ** 2) + jnp.sum(h_last)

    gp, gx = jax.grad(loss_pallas, argnums=(0, 1))(params, xs)
    rp, rx = jax.grad(loss_scan, argnums=(0, 1))(params, xs)
    for a, bb in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(rp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)


def test_pallas_bilstm_grad_matches_scan(rng):
    from vcr_tpu.ops.pallas_gru import bilstm_sequence_pallas

    t, b, i, h = 4, 8, 10, 128
    params = rnn.bilstm_init(jax.random.PRNGKey(7), i, h)
    xs = jnp.asarray(rng.standard_normal((t, b, i)).astype(np.float32))

    gp = jax.grad(lambda p: jnp.sum(bilstm_sequence_pallas(
        p, xs, compute_dtype=jnp.float32, interpret=True) ** 2))(params)
    rp = jax.grad(lambda p: jnp.sum(rnn.bilstm_sequence(
        p, xs, compute_dtype=jnp.float32) ** 2))(params)
    for a, bb in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(rp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4)


def test_use_pallas_trains_end_to_end(tmp_path):
    """spec.use_pallas=True through the REAL train step (jit + grad + Adam) —
    previously this user-visible flag combination crashed (no pallas VJP).
    On the CPU test backend the kernels auto-fall-back to interpret mode."""
    import os

    from tests.test_train_loop import tiny_config
    from tests.util_corpus import build_corpus
    from vcr_tpu.train.loop import train

    tmp = str(tmp_path)
    build_corpus(os.path.join(tmp, "data"), num_videos=4)
    cfg = tiny_config(tmp, epochs=1, use_pallas=True, hidden_size=8)
    metrics = train(cfg)
    assert np.isfinite(metrics["loss"])
