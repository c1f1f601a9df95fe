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
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
