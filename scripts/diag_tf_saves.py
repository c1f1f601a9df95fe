#!/usr/bin/env python
"""Enumerate what transformer-train autodiff SAVES across the layer scan.

The round-4 on-chip OOM dump (onchip_r4/bench_train_tf_remat.log) shows six
f32 (tf_layers, B, 30, 4096) HLO-temp stacks at B=512 — 8.5 GB of residual
saves on a 16 GB chip. This tool reproduces that accounting LOCALLY (CPU,
tiny B): it traces jax.grad of the product loss (train/step.py) and lists
every lax.scan output whose leading dim == tf_layers — those are the
stacked per-layer activation saves the backward will read — with dtype,
shape and bytes extrapolated to a target batch size.

Run before/after a memory change to see exactly which stacks moved:

    JAX_PLATFORMS=cpu python scripts/diag_tf_saves.py --batch 4 --extrap 512
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--extrap", type=int, default=512,
                    help="extrapolate byte totals to this batch size")
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args(argv)

    from vcr_tpu.models import base
    from vcr_tpu.train import step as step_mod

    # the bench_train spec (bench_train.py) — where the B=512 OOM was dumped
    spec = base.ModelSpec(
        arch="transformer", vocab_size=9000, max_len=20, vid_feat_size=4096,
        embed_size=300, hidden_size=512, num_frames=30, dropout_p=0.2,
        sos_id=9000 - 4, compute_dtype=args.compute_dtype, vocab_pad_to=128)
    key = jax.random.PRNGKey(0)
    glove = np.random.RandomState(0).randn(
        spec.vocab_size, spec.embed_size).astype(np.float32)
    params = base.build_model("transformer")[0](key, spec, glove)

    b, l, n = args.batch, spec.max_len, spec.num_frames
    batch = {
        "vid_feats": jnp.zeros((b, n, spec.vid_feat_size), jnp.float32),
        "sent": jnp.zeros((b, l), jnp.int32),
        "sent_len": jnp.full((b,), l, jnp.int32),
        "valid": jnp.ones((b,), jnp.bool_),
    }

    _, apply_fn = base.build_model("transformer")

    def loss_fn(p):
        out = apply_fn(p, spec, batch["vid_feats"], batch["sent"],
                       batch["sent_len"], rng=key, train=True,
                       teacher_force_prob=1.0)
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(params)

    layers = spec.tf_layers
    rows = []

    def walk(jp):
        for eqn in jp.eqns:
            if eqn.primitive.name == "scan":
                for ov in eqn.outvars:
                    aval = ov.aval
                    # (layers, B, ...) only: per-layer activation saves.
                    # Stacked param GRADIENTS are also scan outputs but are
                    # B-independent — excluded by the shape[1] == B test.
                    if getattr(aval, "shape", ()) and aval.shape[0] == layers \
                            and len(aval.shape) >= 3 and aval.shape[1] == b:
                        rows.append((aval.dtype, aval.shape))
            for sub in jax.core.jaxprs_in_params(eqn.params) \
                    if hasattr(jax.core, "jaxprs_in_params") else []:
                walk(sub)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            walk(vv.jaxpr)

    walk(jaxpr.jaxpr)

    scale = args.extrap / b
    total = 0
    print(f"# stacked ({layers}, B, ...) scan outputs (saves) at "
          f"B={b}, extrapolated to B={args.extrap}, "
          f"compute_dtype={args.compute_dtype}")
    agg = {}
    for dt, shp in rows:
        nbytes = int(np.prod(shp)) * np.dtype(dt).itemsize * scale
        k = (str(dt), shp[2:] if len(shp) > 2 else shp)
        agg.setdefault(k, [0, 0])
        agg[k][0] += 1
        agg[k][1] += nbytes
        total += nbytes
    for (dt, tail), (cnt, nb) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {cnt:3d} x {dt:9s} (L,B,{','.join(map(str, tail))})"
              f"  -> {nb / 2**30:7.2f} GiB")
    print(f"TOTAL stacked saves @B={args.extrap}: {total / 2**30:.2f} GiB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
