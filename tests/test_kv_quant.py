"""int8 KV-cache quantization: helper math + (once integrated) the opt-in
quantized slot-decode path.

The serving claim is NOT bit-identity (impossible under quantization) but a
bounded envelope: per-vector symmetric int8 keeps relative error <= 1/127
per K/V vector, attention logits within a small envelope of the bf16-cache
path, and greedy token agreement high on realistic-scale random models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.ops import kvquant


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_roundtrip_error_bound(rng):
    v = jnp.asarray(rng.standard_normal((5, 4, 9, 64)).astype(np.float32))
    q, s = kvquant.quantize(v)
    back = kvquant.dequantize(q, s)
    amax = np.max(np.abs(np.asarray(v)), axis=-1, keepdims=True)
    # round-to-nearest: |err| <= scale/2 = amax/254 elementwise
    err = np.abs(np.asarray(back) - np.asarray(v))
    assert (err <= amax / 254 + 1e-7).all()


def test_zero_vector_is_exact(rng):
    v = jnp.zeros((3, 8))
    q, s = kvquant.quantize(v)
    assert np.asarray(q).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(kvquant.dequantize(q, s)), 0.0)
    # mixed: one zero row among real rows must not NaN/corrupt others
    v2 = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32)
                     ).at[1].set(0.0)
    q2, s2 = kvquant.quantize(v2)
    back = np.asarray(kvquant.dequantize(q2, s2))
    np.testing.assert_array_equal(back[1], 0.0)
    assert np.isfinite(back).all()


def test_fold_k_matches_dequant_dot(rng):
    """(q·K_q)·s == q·dequant(K) exactly in fp32 (scale is a scalar per
    position — it commutes with the contraction over d)."""
    q = jnp.asarray(rng.standard_normal((2, 3, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 3, 10, 16)).astype(np.float32))
    kq, ks = kvquant.quantize(k)                      # (2,3,10,16), (2,3,10,1)
    want = jnp.einsum("bhd,bhld->bhl", q, kvquant.dequantize(kq, ks))
    got = kvquant.fold_k(
        jnp.einsum("bhd,bhld->bhl", q, kq.astype(jnp.float32)), ks[..., 0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fold_v_matches_dequant_dot(rng):
    w = jnp.asarray(rng.standard_normal((2, 3, 10)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 3, 10, 16)).astype(np.float32))
    vq, vs = kvquant.quantize(v)
    want = jnp.einsum("bhl,bhld->bhd", w, kvquant.dequantize(vq, vs))
    got = jnp.einsum("bhl,bhld->bhd", kvquant.fold_v(w, vs[..., 0]),
                     vq.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
