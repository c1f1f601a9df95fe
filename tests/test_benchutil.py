"""jaxpr_flops: trace-time matmul/conv FLOP counter used for MFU reporting.

XLA's compiled cost_analysis counts while-loop bodies once (verified on the
TPU backend), so bench MFU rides on this counter instead — these tests pin
its arithmetic against hand-derived counts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vcr_tpu.utils import benchutil


def test_dense_matmul_flops():
    x = jnp.ones((8, 64), jnp.float32)
    w = jnp.ones((64, 32), jnp.float32)
    got = benchutil.jaxpr_flops(lambda x, w: x @ w, x, w)
    assert got == 2 * 8 * 64 * 32


def test_batched_dot_flops():
    a = jnp.ones((4, 8, 16), jnp.float32)
    b = jnp.ones((4, 16, 32), jnp.float32)
    got = benchutil.jaxpr_flops(jnp.matmul, a, b)
    assert got == 2 * 4 * 8 * 16 * 32


def test_scan_multiplies_trip_count():
    x = jnp.ones((16, 16), jnp.float32)

    def f(x):
        def body(c, _):
            return c @ x, None
        c, _ = jax.lax.scan(body, x, None, length=7)
        return c

    assert benchutil.jaxpr_flops(f, x) == 7 * 2 * 16 ** 3


def test_conv_flops():
    # NCHW conv, SAME padding: 2 * out_elems * k*k * Cin
    from vcr_tpu.nn.layers import conv2d, conv2d_init
    p = conv2d_init(jax.random.PRNGKey(0), 12, 5, 3)
    x = jnp.ones((2, 12, 13, 13), jnp.float32)
    got = benchutil.jaxpr_flops(
        lambda p, x: conv2d(p, x, compute_dtype=jnp.float32), p, x)
    assert got == 2 * (2 * 5 * 13 * 13) * 3 * 3 * 12


def test_cond_takes_max_branch():
    x = jnp.ones((8, 8), jnp.float32)

    def f(x):
        return jax.lax.cond(x[0, 0] > 0, lambda x: x @ x @ x, lambda x: x @ x, x)

    assert benchutil.jaxpr_flops(f, x) == 2 * 2 * 8 ** 3


def test_s2vt_apply_flops_scale_with_batch():
    # End-to-end smoke: doubling the batch doubles counted FLOPs.
    from vcr_tpu.models import base, s2vt
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((40, 8)).astype(np.float32)
    spec = base.ModelSpec(
        arch="s2vt", vocab_size=40, embed_size=8, hidden_size=16,
        vid_feat_size=12, max_len=5, num_frames=4, dropout_p=0.0,
        sos_id=36, compute_dtype="float32")
    params = s2vt.init_params(jax.random.PRNGKey(0), spec, glove)

    def fwd(b):
        x = jnp.ones((b, 4, 12), jnp.float32)
        return benchutil.jaxpr_flops(
            lambda p: s2vt.apply(p, spec, x, train=False), params)

    f1, f2 = fwd(2), fwd(4)
    assert f1 is not None and f2 == 2 * f1


def test_mfu_none_on_unknown_device():
    class Fake:
        device_kind = "CPU"
    assert benchutil.mfu(1e9, 1.0, Fake()) is None
    class V5e:
        device_kind = "TPU v5 lite"
    assert abs(benchutil.mfu(197e12, 1.0, V5e()) - 1.0) < 1e-9


def test_chunked_device_put_matches_one_shot():
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((17, 5)).astype(np.float32)  # odd row count
    # 1 row is 20 bytes; 50e-6 MB => 2 rows/request => 9 uneven slices
    out = benchutil.chunked_device_put(arr, limit_mb=50e-6)
    assert isinstance(out, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), arr)
    # above-limit size and limit 0 take the single-shot path
    np.testing.assert_array_equal(
        np.asarray(benchutil.chunked_device_put(arr, limit_mb=0)), arr)
    np.testing.assert_array_equal(
        np.asarray(benchutil.chunked_device_put(arr, limit_mb=10)), arr)
    # 0-d passthrough must not try to row-slice
    assert float(benchutil.chunked_device_put(np.float32(4.0), 1e-9)) == 4.0


def test_time_chained_returns_timing_flops_mfu():
    x = jnp.ones((16, 16), jnp.float32)

    @jax.jit
    def run_n(x):
        def body(c, _):
            return c @ x, None
        c, _ = jax.lax.scan(body, x, None, length=3)
        return c

    dt, flops, mfu = benchutil.time_chained(run_n, (x,), jax.devices()[0])
    assert dt > 0
    assert flops == 3 * 2 * 16 ** 3
    assert mfu is None  # CPU device kind is unknown to the peak table
