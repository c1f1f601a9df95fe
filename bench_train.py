"""Training-step throughput benchmarks on one TPU chip.

Default (no args): the S2VT flagship config — one JSON line, same contract as
bench.py (the driver's headline bench stays inference; this is the training
analogue: jitted forward + backward + Adam + global-norm clip at the
reference's training configuration).

``python bench_train.py all`` benches every model family (S2VT, S2VT-att,
Transformer, RationaleNet, SpatialNet) with its BASELINE.json feature config,
one JSON line per family, using the same loss adapters as the real training
loop (vcr_tpu/train/step.py — masked CE, rationale 3-term loss, spatial BN
merge).

Timing: N optimization steps chained inside one jit via lax.scan — removes the
~24ms/call host<->TPU tunnel dispatch from the measurement (see bench.py).
"""

import json
import os
import sys
import time

import numpy as np

FAMILY_DEFAULTS = {
    # family: (batch, feats_shape, spec_kwargs)
    "s2vt": (1024, (30, 4096), {}),
    "s2vt-att": (1024, (30, 512), {}),
    "transformer": (128, (30, 4096), {}),
    "rationale": (512, (30, 4096), {"base_arch": "s2vt"}),
    "spatial": (16, (30, 1024, 13, 13), {"base_arch": "s2vt", "grid_size": 13}),
}


def bench_family(name: str, iters: int) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from vcr_tpu.models import base
    from vcr_tpu.train import optim, step as step_mod
    from vcr_tpu.utils import benchutil

    batch, feats_shape, spec_kw = FAMILY_DEFAULTS[name]
    batch = int(os.environ.get("VCR_BENCH_BATCH", batch))
    use_pallas = os.environ.get("VCR_BENCH_PALLAS", "0") == "1"
    # VCR_BENCH_ACCUM=N: gradient accumulation (Config.grad_accum) — N
    # sequential microbatches per update; shrinks the emitted program to the
    # B/N one (the third candidate for SpatialNet's B=32 tunnel 413, next to
    # chunked upload and remat) while keeping the effective batch
    accum = int(os.environ.get("VCR_BENCH_ACCUM", "1"))
    assert batch % accum == 0, f"batch {batch} % accum {accum} != 0"

    vocab_size, embed = 9000, 300
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((vocab_size, embed)).astype(np.float32)
    spec = base.ModelSpec(
        arch=name, vocab_size=vocab_size, embed_size=embed, hidden_size=512,
        vid_feat_size=feats_shape[-1] if len(feats_shape) == 2 else feats_shape[1],
        max_len=20, num_frames=30, dropout_p=0.2, sos_id=vocab_size - 4,
        compute_dtype="bfloat16", vocab_pad_to=128, use_pallas=use_pallas,
        **spec_kw)

    init_fn, apply_fn = base.build_model(name)
    params = jax.device_put(init_fn(jax.random.PRNGKey(0), spec, glove))
    optimizer = optim.build_optimizer("adam", 2e-3, 4e-5, 1.0)
    opt_state = optimizer.init(params)

    batch_data = {
        "vid_feats": benchutil.chunked_device_put(
            rng.standard_normal((batch, *feats_shape)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "sent": jax.device_put(rng.integers(0, vocab_size, (batch, 20)).astype(np.int32)),
        "sent_len": jax.device_put(np.full((batch,), 12, np.int32)),
        "valid": jax.device_put(np.ones((batch,), np.float32)),
    }

    def fwd(p, vid_feats, sent, sent_len, key, tf_prob):
        return apply_fn(p, spec, vid_feats, sent, sent_len, rng=key,
                        train=True, teacher_force_prob=tf_prob)

    if os.environ.get("VCR_BENCH_REMAT") == "1":
        # rematerialize the forward in the backward pass: trades FLOPs for
        # activation memory AND shrinks the emitted backward program (the
        # other candidate for the tunnel's 413 on big spatial steps)
        fwd = jax.checkpoint(fwd)

    def loss_fn(p, bdata, key):
        loss, _metrics, _pred, aux = step_mod._forward(
            name, fwd, p, bdata, key, 1.0, 1.0, 1.0)
        return loss, aux

    @jax.jit
    def run_n(params, opt_state, key):
        def body(carry, i):
            p, o = carry
            if accum == 1:
                grads, aux = jax.grad(loss_fn, has_aux=True)(
                    p, batch_data, jax.random.fold_in(key, i))
            else:
                # all rows valid here => plain mean of microbatch grads
                # (the train loop's step does the valid-weighted general case)
                micro = jax.tree_util.tree_map(
                    lambda v: v.reshape(accum, batch // accum, *v.shape[1:]),
                    batch_data)

                def mbody(g_acc, xs):
                    mb, j = xs
                    g, aux_j = jax.grad(loss_fn, has_aux=True)(
                        p, mb, jax.random.fold_in(jax.random.fold_in(key, i), j))
                    return jax.tree_util.tree_map(jnp.add, g_acc, g), aux_j

                zero = jax.tree_util.tree_map(jnp.zeros_like, p)
                g_sum, auxs = jax.lax.scan(
                    mbody, zero, (micro, jnp.arange(accum)))
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
                aux = jax.tree_util.tree_map(lambda x: x[-1], auxs)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            if "bn_state" in aux:
                p = step_mod._merge_bn(p, aux["bn_state"])
            return (p, o), None
        (p, _), _ = jax.lax.scan(body, (params, opt_state), jnp.arange(iters))
        leaf = jax.tree_util.tree_leaves(p)[0]
        return leaf.astype(jnp.float32).ravel()[0]

    # typed rbg key = the training loop's default (Config.rng_impl): the TPU
    # hardware RNG makes dropout mask generation ~free vs threefry
    key = lambda s: jax.random.key(s, impl="rbg")  # noqa: E731
    np.asarray(run_n(params, opt_state, key(0)))  # compile
    dt = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        np.asarray(run_n(params, opt_state, key(1 + rep)))
        dt = min(dt, time.perf_counter() - t0)

    flops = benchutil.jaxpr_flops(run_n, params, opt_state, key(1))
    mfu = benchutil.mfu(flops, dt, jax.devices()[0])

    out = {
        "metric": f"{name} train step videos/sec/chip (B={batch}, bf16)",
        "value": round(batch * iters / dt, 2),
        "unit": "videos/s",
        "step_ms": round(dt / iters * 1e3, 2),
    }
    if accum > 1:
        out["grad_accum"] = accum
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out), flush=True)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vcr_tpu.utils import backend_probe

    ok, diag = backend_probe.ensure_backend()
    if not ok:
        backend_probe.emit_failure_json(
            metric="train videos/sec/chip", unit="videos/s", diag=diag)
        sys.exit(1)

    iters = int(os.environ.get("VCR_BENCH_ITERS", "10"))
    which = sys.argv[1] if len(sys.argv) > 1 else "s2vt"
    families = list(FAMILY_DEFAULTS) if which == "all" else [which]
    for name in families:
        bench_family(name, iters)


if __name__ == "__main__":
    main()
