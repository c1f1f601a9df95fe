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
