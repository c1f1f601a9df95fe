"""Forensic probe: which EAGER s4 (jnp.int4) operations work on this
backend? The round-5 on-chip tpu_checks run found eager
``jnp.zeros(..., jnp.int4)`` dies on the axon TPU client with
"RecursionError: Recursively calling jit" (fixed via the jitted-thunk
zeros in models/transformer.py). This probe maps the rest of the eager-s4
surface so the int4 serving paths can document exactly what requires a
trace. Run on the real TPU when free:  python scripts/probe_int4_eager.py
"""

import sys

import numpy as np


def try_(label, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"OK    {label}")
        return True
    except Exception as e:
        print(f"CRASH {label}: {type(e).__name__}: {str(e)[:120]}")
        return False


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    ok = True
    ok &= try_("eager jnp.zeros int8", lambda: jnp.zeros((4, 4), jnp.int8))
    try_("eager jnp.zeros int4", lambda: jnp.zeros((4, 4), jnp.int4))
    ok &= try_("jitted zeros int4",
               lambda: jax.jit(jnp.zeros, static_argnums=(0, 1))(
                   (4, 4), jnp.int4))
    x = jnp.asarray(np.random.randn(4, 4), jnp.float32)
    try_("eager astype int4", lambda: jnp.round(x).astype(jnp.int4))
    ok &= try_("jitted astype int4",
               lambda: jax.jit(lambda v: jnp.round(v).astype(jnp.int4))(x))
    try_("eager int4 -> f32 read",
         lambda: jax.jit(jnp.zeros, static_argnums=(0, 1))(
             (4, 4), jnp.int4).astype(jnp.float32))
    # the product path: quantize eagerly (construction-time cross K/V)
    from vcr_tpu.ops import kvquant

    qmax, qdtype = kvquant.mode_params("int4")
    try_("eager kvquant.quantize int4",
         lambda: kvquant.quantize(x, qmax=qmax, qdtype=qdtype)[0])
    ok &= try_("jitted kvquant.quantize int4",
               lambda: jax.jit(lambda v: kvquant.quantize(
                   v, qmax=qmax, qdtype=qdtype)[0])(x))

    # The r5 bench_all on-chip crash: an s4 array produced by one jit and
    # consumed by ANOTHER jit whose executable wants a different (packed)
    # layout — jax relayouts via device_put, which recurses on the axon
    # client. These probes map whether any cross-program s4 handoff works.
    big = jax.jit(lambda v: jnp.round(v * 3).astype(jnp.int4))(
        jnp.asarray(np.random.randn(512, 8, 20, 64), jnp.float32))
    try_("s4 jit-A output -> jit-B arg (matmul-shaped consumer)",
         lambda: jax.jit(lambda q: jnp.einsum(
             "rhld,rhd->rhl", q.astype(jnp.bfloat16),
             jnp.ones((512, 8, 64), jnp.bfloat16)))(big))
    try_("s4 jit-A output -> jit-B arg (elementwise consumer)",
         lambda: jax.jit(lambda q: q.astype(jnp.float32).sum())(big))

    # The product surface at risk: the int4 POOL state crosses the tick
    # jit's boundary every call. A 4-slot end-to-end caption_all decides
    # whether kv_cache="int4" serving works on this backend at all.
    from vcr_tpu.models import base as mbase
    from vcr_tpu.models import transformer as trm
    from vcr_tpu.serving_continuous import ContinuousCaptioner

    rng = np.random.default_rng(0)
    spec = mbase.ModelSpec(
        arch="transformer", vocab_size=128, embed_size=16, hidden_size=16,
        vid_feat_size=24, max_len=8, num_frames=4, dropout_p=0.0,
        sos_id=124, compute_dtype="bfloat16", tf_layers=2, tf_heads=2)
    params = trm.init_params(jax.random.PRNGKey(0), spec,
                             rng.standard_normal((128, 16)).astype(np.float32))
    feats = rng.standard_normal((5, 4, 24)).astype(np.float32)

    def pool(kv):
        cc = ContinuousCaptioner(params, spec, slots=4, admit_chunk=2,
                                 eos_id=125, kv_cache=kv)
        got = cc.caption_all({i: feats[i] for i in range(5)})
        assert sorted(got) == list(range(5))
        return got[0]

    ok &= try_("int8 pool caption_all", lambda: pool("int8"))
    try_("int4 pool caption_all", lambda: pool("int4"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
