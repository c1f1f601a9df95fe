#!/usr/bin/env python
"""Enumerate per-family train-step scan saves (the backward's byte bill).

Generalizes scripts/diag_tf_saves.py to every model family: traces jax.grad
of the product forward at the bench_train spec (tiny B locally, CPU) and
lists every lax.scan stacked output — the per-iteration activation saves the
transposed scan will read back — grouped by dtype/shape, with bytes
extrapolated to the bench batch size. f32 rows on memory-bound steps are
candidates for compute-dtype saves or checkpoint policies.

    JAX_PLATFORMS=cpu python scripts/diag_train_saves.py s2vt --batch 8
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# bench_train.py FAMILY_DEFAULTS (batch, feats_shape, spec_kwargs)
FAMILY_DEFAULTS = {
    "s2vt": (1024, (30, 4096), {}),
    "s2vt-att": (1024, (30, 512), {}),
    "transformer": (256, (30, 4096), {}),
    "rationale": (512, (30, 4096), {"base_arch": "s2vt"}),
    "spatial": (16, (30, 1024, 13, 13), {"base_arch": "s2vt", "grid_size": 13}),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=list(FAMILY_DEFAULTS))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--extrap", type=int, default=0,
                    help="extrapolate byte totals to this batch size "
                         "(default: the family's bench batch)")
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args(argv)

    from vcr_tpu.models import base

    bench_b, feats_shape, spec_kw = FAMILY_DEFAULTS[args.family]
    extrap = args.extrap or bench_b
    vocab_size, embed = 9000, 300
    glove = np.random.default_rng(0).standard_normal(
        (vocab_size, embed)).astype(np.float32)
    spec = base.ModelSpec(
        arch=args.family, vocab_size=vocab_size, embed_size=embed,
        hidden_size=512,
        vid_feat_size=feats_shape[-1] if len(feats_shape) == 2
        else feats_shape[1],
        max_len=20, num_frames=30, dropout_p=0.2, sos_id=vocab_size - 4,
        compute_dtype=args.compute_dtype, vocab_pad_to=128, **spec_kw)

    init_fn, apply_fn = base.build_model(args.family)
    params = init_fn(jax.random.PRNGKey(0), spec, glove)

    b, l = args.batch, spec.max_len
    key = jax.random.PRNGKey(0)
    feats = jnp.zeros((b, *feats_shape), jnp.float32)
    sent = jnp.zeros((b, l), jnp.int32)
    slen = jnp.full((b,), l, jnp.int32)

    def loss_fn(p):
        out = apply_fn(p, spec, feats, sent, slen, rng=key, train=True,
                       teacher_force_prob=1.0)
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(params)

    rows = []

    def walk(jp):
        for eqn in jp.eqns:
            if eqn.primitive.name == "scan":
                for ov in eqn.outvars:
                    aval = ov.aval
                    shp = getattr(aval, "shape", ())
                    # stacked (iters, ..., B, ...) saves: any output with a
                    # batch axis and at least iters x batch x features rank.
                    if len(shp) >= 3 and b in shp[1:]:
                        rows.append((aval.dtype, shp))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            walk(vv.jaxpr)

    walk(jaxpr.jaxpr)

    scale = extrap / b
    total = f32_total = 0
    agg = {}
    for dt, shp in rows:
        nbytes = int(np.prod(shp)) * np.dtype(dt).itemsize * scale
        k = (str(dt), shp[:1] + tuple("B" if d == b else d for d in shp[1:]))
        agg.setdefault(k, [0, 0])
        agg[k][0] += 1
        agg[k][1] += nbytes
        total += nbytes
        if dt == jnp.float32:
            f32_total += nbytes
    print(f"# {args.family}: stacked scan saves at B={b}, extrapolated to "
          f"B={extrap}, compute_dtype={args.compute_dtype}")
    for (dt, shp), (cnt, nb) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {cnt:3d} x {dt:9s} {shp}  -> {nb / 2**30:7.3f} GiB")
    print(f"TOTAL stacked saves @B={extrap}: {total / 2**30:.2f} GiB "
          f"(f32 rows: {f32_total / 2**30:.2f} GiB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
