"""Byte-level forensics for the SpatialNet B=32 remote_compile HTTP 413
(VERDICT r3 #4).

Round 3 established the 413 fires AT COMPILE TIME ("Failed to buffer the
request body" from the tunnel's remote_compile endpoint) for every mitigation
that shrinks per-step DATA (chunked upload, grad_accum, remat) — so something
B-dependent is in the compile payload itself. This script measures it on CPU:
it builds the exact bench_train.py spatial step program at a sweep of batch
sizes, lowers it, and reports the serialized StableHLO size, split by
how the batch tensor is bound:

  closure   — bench_train's historical shape: ``run_n`` closes over
              ``batch_data``, which JAX embeds into the module as dense
              stablehlo.constant bytes (B-DEPENDENT payload)
  argument  — batch passed as a jit argument (program is B-independent in
              constant bytes; only shapes change)

Run:  JAX_PLATFORMS=cpu python scripts/measure_spatial_program.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcr_tpu.models import base  # noqa: E402
from vcr_tpu.train import optim, step as step_mod  # noqa: E402


def build(batch, bind, accum=1, remat=False, iters=10):
    """Mirror bench_train.bench_family('spatial', ...) program construction."""
    feats_shape = (30, 1024, 13, 13)
    vocab_size, embed = 9000, 300
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((vocab_size, embed)).astype(np.float32)
    spec = base.ModelSpec(
        arch="spatial", vocab_size=vocab_size, embed_size=embed,
        hidden_size=512, vid_feat_size=feats_shape[1], max_len=20,
        num_frames=30, dropout_p=0.2, sos_id=vocab_size - 4,
        compute_dtype="bfloat16", vocab_pad_to=128, base_arch="s2vt",
        grid_size=13)
    init_fn, apply_fn = base.build_model("spatial")
    params = init_fn(jax.random.PRNGKey(0), spec, glove)
    optimizer = optim.build_optimizer("adam", 2e-3, 4e-5, 1.0)
    opt_state = optimizer.init(params)
    # RANDOM data, exactly like bench_train: all-zeros would lower to a
    # broadcast(0) constant and hide the embedded-constant bytes entirely
    # (the first run of this script made exactly that mistake).
    batch_data = {
        "vid_feats": jnp.asarray(
            rng.standard_normal((batch, *feats_shape)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "sent": jnp.asarray(
            rng.integers(0, vocab_size, (batch, 20)).astype(np.int32)),
        "sent_len": jnp.full((batch,), 12, jnp.int32),
        "valid": jnp.ones((batch,), jnp.float32),
    }

    def fwd(p, vid_feats, sent, sent_len, key, tf_prob):
        return apply_fn(p, spec, vid_feats, sent, sent_len, rng=key,
                        train=True, teacher_force_prob=tf_prob)

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(p, bdata, key):
        loss, _m, _p, aux = step_mod._forward(
            "spatial", fwd, p, bdata, key, 1.0, 1.0, 1.0)
        return loss, aux

    def one_update(p, o, bdata, key, i):
        if accum == 1:
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                p, bdata, jax.random.fold_in(key, i))
        else:
            micro = jax.tree_util.tree_map(
                lambda v: v.reshape(accum, batch // accum, *v.shape[1:]),
                bdata)

            def mbody(g_acc, xs):
                mb, j = xs
                g, aux_j = jax.grad(loss_fn, has_aux=True)(
                    p, mb, jax.random.fold_in(jax.random.fold_in(key, i), j))
                return jax.tree_util.tree_map(jnp.add, g_acc, g), aux_j

            zero = jax.tree_util.tree_map(jnp.zeros_like, p)
            g_sum, auxs = jax.lax.scan(mbody, zero,
                                       (micro, jnp.arange(accum)))
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            aux = jax.tree_util.tree_map(lambda x: x[-1], auxs)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        if "bn_state" in aux:
            p = step_mod._merge_bn(p, aux["bn_state"])
        return p, o

    if bind == "closure":
        def run_n(params, opt_state, key):
            def body(carry, i):
                p, o = carry
                return one_update(p, o, batch_data, key, i), None
            (p, _), _ = jax.lax.scan(body, (params, opt_state),
                                     jnp.arange(iters))
            return jax.tree_util.tree_leaves(p)[0].astype(
                jnp.float32).ravel()[0]
        lowered = jax.jit(run_n).lower(params, opt_state,
                                       jax.random.PRNGKey(0))
    else:
        def run_n(params, opt_state, bdata, key):
            def body(carry, i):
                p, o = carry
                return one_update(p, o, bdata, key, i), None
            (p, _), _ = jax.lax.scan(body, (params, opt_state),
                                     jnp.arange(iters))
            return jax.tree_util.tree_leaves(p)[0].astype(
                jnp.float32).ravel()[0]
        lowered = jax.jit(run_n).lower(params, opt_state, batch_data,
                                       jax.random.PRNGKey(0))
    return lowered


def module_bytes(lowered):
    mod = lowered.compiler_ir(dialect="stablehlo")
    try:
        from jax._src.interpreters import mlir as jmlir
        data = jmlir.module_to_bytecode(mod)
        return len(data)
    except Exception:
        return len(str(mod).encode())


def main():
    rows = []
    for batch, bind, accum, remat in [
        (8, "closure", 1, False),
        (16, "closure", 1, False),
        (16, "closure", 2, False),
        (16, "closure", 1, True),
        (32, "closure", 1, False),
        (8, "argument", 1, False),
        (16, "argument", 1, False),
        (32, "argument", 1, False),
    ]:
        lowered = build(batch, bind, accum=accum, remat=remat)
        n = module_bytes(lowered)
        row = {"batch": batch, "bind": bind, "accum": accum,
               "remat": remat, "stablehlo_bytes": n}
        rows.append(row)
        print(json.dumps(row), flush=True)

    by = {(r["batch"], r["bind"], r["accum"], r["remat"]):
          r["stablehlo_bytes"] for r in rows}
    c8, c16 = by[(8, "closure", 1, False)], by[(16, "closure", 1, False)]
    a8, a16 = by[(8, "argument", 1, False)], by[(16, "argument", 1, False)]
    growth_closure = c16 - c8
    growth_arg = a16 - a8
    print(f"\nclosure-bound module grows {growth_closure/2**20:.1f} MiB "
          f"per +8 batch rows; argument-bound grows "
          f"{growth_arg/2**20:.3f} MiB.")
    feat_bytes = 8 * 30 * 1024 * 13 * 13 * 2
    print(f"(the embedded bf16 batch constant itself is "
          f"{feat_bytes/2**20:.1f} MiB per 8 rows)")
    if growth_closure > 10 * growth_arg + 2**20:
        print("=> VERDICT: the 413 payload is the CLOSED-OVER batch_data "
              "embedded as a stablehlo dense constant — pass the batch as a "
              "jit ARGUMENT and the compile request is B-independent.")
    else:
        print("=> closure constants are NOT the growth — look at per-op "
              "program size next.")


if __name__ == "__main__":
    main()
