#!/usr/bin/env python
"""Diagnose the S2VT-att train anomalies on-chip (VERDICT r2 "Next round" #6):

  (a) train MFU 0.14 at B=1024 ("GRU-step-bound at 512-d feats"), and
  (b) the measured B=2048 REGRESSION (20.3k videos/s vs 24.7k at B=1024).

Method — all numbers from chained on-device loops (bench_train's timing
discipline; the axon tunnel's ~24ms dispatch makes anything else noise):

  1. Full train step at B ∈ {512, 1024, 2048}: step ms, videos/s, MFU.
  2. Component splits at each B (forward-only encode; forward-only full;
     fwd+bwd without optimizer) to locate where the B=2048 cliff appears.
  3. Feature-width experiment: same model with vid_feat_size padded 512→1024
     (zero-padded features + weights) — if the 512-d input projection's
     (B·N, 512)×(512, 2H) matmul is lane-underutilized, the 1024-d pad
     should RAISE MFU at equal work-per-frame.
  4. Optional `--trace DIR`: jax.profiler traces per batch size for op-level
     attribution (open with tensorboard or xprof).

Run on the real TPU: `python scripts/diag_s2vt_att.py [--trace /tmp/tr]`.
Writes one JSON line per measurement; paste conclusions into DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", default="512,1024,2048")
    ap.add_argument("--pad_batches", default="1024,2048",
                    help="batch sizes for the 512->1024 feature-pad experiment")
    ap.add_argument("--bisect", action="store_true",
                    help="round-4 backward bisection rows (autodiff A/B, "
                         "scan vs reconstruction split, HBM triad)")
    args = ap.parse_args()

    from vcr_tpu.utils import backend_probe

    ok, diag = backend_probe.ensure_backend()
    if not ok:
        backend_probe.emit_failure_json(metric="s2vt-att diag", unit="ms",
                                        diag=diag)
        return 1

    import jax
    import jax.numpy as jnp

    from vcr_tpu.models import base, s2vt_att
    from vcr_tpu.train import optim
    from vcr_tpu.train.step import build_step_fns
    from vcr_tpu.utils import benchutil

    vocab_size, embed = 9000, 300
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((vocab_size, embed)).astype(np.float32)
    device = jax.devices()[0]
    iters = args.iters

    def emit(**row):
        print(json.dumps(row), flush=True)

    def timed(label, run_n, *xs, flops_of=None, batch=None):
        dt, _flops, m = benchutil.time_chained(run_n, xs, device)
        row = {"metric": label, "step_ms": round(dt / iters * 1e3, 3)}
        if batch:
            row["videos_per_s"] = round(batch * iters / dt, 1)
        if flops_of is not None and m is not None:
            row["mfu"] = round(m, 4)
        emit(**row)
        return dt

    def build(vid_feat_size):
        spec = base.ModelSpec(
            arch="s2vt-att", vocab_size=vocab_size, embed_size=embed,
            hidden_size=512, vid_feat_size=vid_feat_size, max_len=20,
            num_frames=30, dropout_p=0.2, sos_id=vocab_size - 4,
            compute_dtype="bfloat16", vocab_pad_to=128)
        params = jax.device_put(
            s2vt_att.init_params(jax.random.PRNGKey(0), spec, glove))
        opt = optim.build_optimizer("adam", 1e-4, 4e-5, 1.0)
        opt_state = jax.device_put(opt.init(params))
        train_step, _ = build_step_fns("s2vt-att", spec, opt, 0.0, 0.0)
        return spec, params, opt, opt_state, train_step

    spec, params, opt, opt_state, train_step = build(512)
    key = jax.random.PRNGKey(1)

    for b in [int(x) for x in args.batches.split(",")]:
        batch = {
            "vid_feats": jax.device_put(
                rng.standard_normal((b, 30, 512)).astype(np.float32)
            ).astype(jnp.bfloat16),
            "sent": jax.device_put(
                rng.integers(0, vocab_size, (b, 20)).astype(np.int32)),
            "sent_len": jax.device_put(np.full((b,), 12, np.int32)),
            "valid": jax.device_put(np.ones((b,), np.float32)),
        }

        # 1. full train step
        @jax.jit
        def full_n(p, s, bt, k):
            def body(c, _):
                p2, s2, m, _ = train_step(c[0], c[1], bt, k, 1.0)
                return (p2, s2), m["loss"]
            (p, s), losses = jax.lax.scan(body, (p, s), None, length=iters)
            return losses[-1]

        def trace_ctx():
            if args.trace:
                d = os.path.join(args.trace, f"b{b}")
                return jax.profiler.trace(d)
            import contextlib
            return contextlib.nullcontext()

        with trace_ctx():
            timed(f"s2vt-att FULL train step B={b}", full_n, params,
                  opt_state, batch, key, flops_of=True, batch=b)

        # 2a. forward-only encode (the input projection + BiGRU encoder)
        @jax.jit
        def enc_n(p, v):
            def body(c, _):
                out = s2vt_att.encode(p, spec, (v * (1 + c * 1e-9)
                                                ).astype(v.dtype))
                first = out[0] if isinstance(out, tuple) else out
                return first.astype(jnp.float32).ravel()[0] * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        timed(f"s2vt-att encode-only fwd B={b}", enc_n, params,
              batch["vid_feats"], flops_of=True, batch=b)

        # 2b. full forward (train=True math, no grad)
        @jax.jit
        def fwd_n(p, bt, k):
            def body(c, _):
                logits = s2vt_att.apply(
                    p, spec, bt["vid_feats"], bt["sent"], bt["sent_len"],
                    rng=k, train=True, teacher_force_prob=1.0)
                return logits.astype(jnp.float32).ravel()[0] * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c

        timed(f"s2vt-att forward-only B={b}", fwd_n, params, batch, key,
              flops_of=True, batch=b)

    # 2c. backward bisection (round 4: measured 2.3x over the XLA-cost-model
    # roofline; split the backward into its parts to find the gap)
    if args.bisect:
        from vcr_tpu.models.s2vt_att import (_attention_scan,
                                             _attention_scan_bwd,
                                             bahdanau_project_keys)

        for b in [int(x) for x in args.batches.split(",")]:
            n, h, l, e = 30, 512, 20, embed
            dec = params["decoder"]
            qv = {"query_layer": dec["attention"]["query_layer"],
                  "energy_layer": dec["attention"]["energy_layer"]}
            enc_outs = jax.device_put(rng.standard_normal(
                (b, n, h)).astype(np.float32)).astype(jnp.bfloat16)
            pk = bahdanau_project_keys(dec["attention"], enc_outs, spec.cdtype)
            h0 = jnp.zeros((b, h), jnp.float32)
            embs = jax.device_put(rng.standard_normal(
                (l, b, e)).astype(np.float32)).astype(jnp.bfloat16)
            cname = jnp.dtype(spec.cdtype).name

            def scan_loss(qv_, rnn_, pk_, vals_, h0_, embs_):
                st = _attention_scan(cname, qv_, rnn_, pk_, vals_, h0_, embs_)
                return jnp.sum(st.astype(jnp.float32)) * 1e-9

            gfn = jax.grad(scan_loss, argnums=(0, 1, 2, 3, 4, 5))

            @jax.jit
            def scan_fwdbwd_n(qv_, rnn_, pk_, vals_, h0_, embs_):
                def body(c, _):
                    g = gfn(qv_, rnn_, pk_, vals_, h0_ + c, embs_)
                    return g[4].astype(jnp.float32).ravel()[0] * 1e-12, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
                return c

            timed(f"att-scan fwd+bwd only B={b}", scan_fwdbwd_n, qv,
                  dec["rnn"], pk, enc_outs, h0, embs, batch=b)

            # the hand-scheduled backward ALONE (reversed scan + batched
            # reconstruction), fed synthetic residuals/cotangents
            states = jax.device_put(rng.standard_normal(
                (l, b, h)).astype(np.float32))
            d_states = jax.device_put(rng.standard_normal(
                (l, b, h)).astype(np.float32))
            res = (qv, dec["rnn"], pk, enc_outs, h0, embs, states)

            @jax.jit
            def bwd_only_n(res_, d_):
                def body(c, _):
                    g = _attention_scan_bwd(cname, res_, d_ * (1 + c * 1e-9))
                    return g[4].astype(jnp.float32).ravel()[0] * 1e-12, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
                return c

            timed(f"att-scan custom-bwd only B={b}", bwd_only_n, res,
                  d_states, batch=b)

            # the two batched reconstructions ALONE ((L,B,N,H) tanh sweep +
            # the d_values einsum) — the non-scan half of the backward
            d_scores_a = jax.device_put(rng.standard_normal(
                (l, b, n)).astype(np.float32))
            d_ctx_a = jax.device_put(rng.standard_normal(
                (l, b, h)).astype(np.float32))
            alphas_a = jax.device_put(rng.standard_normal(
                (l, b, n)).astype(np.float32))
            qs = states
            cdt = jnp.dtype(spec.cdtype)
            from vcr_tpu.nn.layers import dense as _dense

            @jax.jit
            def recon_n(qv_, pk_, vals_, qs_, dsc_, dctx_, al_):
                def body(c, _):
                    d_values = jnp.einsum(
                        "tbn,tbd->bnd", al_.astype(cdt), dctx_.astype(cdt),
                        preferred_element_type=jnp.float32)
                    qp_all = _dense(qv_["query_layer"], qs_ + c, cdt)
                    v_e = qv_["energy_layer"]["w"][:, 0].astype(cdt).astype(
                        jnp.float32)
                    tanh_all = jnp.tanh(qp_all[:, :, None, :] + pk_[None])
                    d_energy = (1.0 - tanh_all * tanh_all) * (
                        dsc_[..., None] * v_e)
                    d_pk = jnp.sum(d_energy, axis=0)
                    return (d_pk.ravel()[0] + d_values.ravel()[0]) * 1e-12, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
                return c

            timed(f"att-bwd reconstruction only B={b}", recon_n, qv, pk,
                  enc_outs, qs, d_scores_a, d_ctx_a, alphas_a, batch=b)

            # FULL train step with plain autodiff through the scan (A/B the
            # custom VJP on-chip; env is read at TRACE time)
            os.environ["VCR_ATT_SCAN"] = "autodiff"
            try:
                _, _, _, _, ts_auto = build(512)

                @jax.jit
                def full_auto_n(p, s, bt, k):
                    def body(c, _):
                        p2, s2, m, _ = ts_auto(c[0], c[1], bt, k, 1.0)
                        return (p2, s2), m["loss"]
                    (p, s), losses = jax.lax.scan(body, (p, s), None,
                                                  length=iters)
                    return losses[-1]

                batch = {
                    "vid_feats": jax.device_put(rng.standard_normal(
                        (b, 30, 512)).astype(np.float32)).astype(jnp.bfloat16),
                    "sent": jax.device_put(rng.integers(
                        0, vocab_size, (b, 20)).astype(np.int32)),
                    "sent_len": jax.device_put(np.full((b,), 12, np.int32)),
                    "valid": jax.device_put(np.ones((b,), np.float32)),
                }
                timed(f"s2vt-att FULL train step AUTODIFF B={b}", full_auto_n,
                      params, opt_state, batch, key, flops_of=True, batch=b)
            finally:
                os.environ.pop("VCR_ATT_SCAN", None)

        # achievable-HBM-bandwidth calibration: the roofline divides by the
        # spec sheet's 819 GB/s; this measures what a pure stream actually
        # sustains inside a chained scan on this chip/tunnel
        mb = 256
        x = jnp.ones((mb * 1024 * 1024 // 2,), jnp.bfloat16)
        y = jnp.ones_like(x) * 0.5

        @jax.jit
        def triad_n(x_, y_):
            def body(c, _):
                z = x_ + jnp.float32(2.5).astype(x_.dtype) * (y_ + c)
                return z.ravel()[0].astype(jnp.bfloat16), None
            c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)
            return c.astype(jnp.float32)

        dt, _f, _m = benchutil.time_chained(triad_n, (x, y), device)
        moved = 3 * x.size * 2 * iters  # read x, read y, write z per iter
        emit(metric="hbm stream triad (bf16)", step_ms=round(dt / iters * 1e3, 3),
             gb_per_s=round(moved / dt / 1e9, 1), peak_gb_per_s=819)

    # 3. feature-width pad 512 -> 1024 (equal batch, same logical work)
    spec2, params2, opt2, opt_state2, train_step2 = build(1024)
    for b in [int(x) for x in args.pad_batches.split(",") if x]:
        batch = {
            "vid_feats": jax.device_put(
                np.concatenate([
                    rng.standard_normal((b, 30, 512)).astype(np.float32),
                    np.zeros((b, 30, 512), np.float32)], axis=-1)
            ).astype(jnp.bfloat16),
            "sent": jax.device_put(
                rng.integers(0, vocab_size, (b, 20)).astype(np.int32)),
            "sent_len": jax.device_put(np.full((b,), 12, np.int32)),
            "valid": jax.device_put(np.ones((b,), np.float32)),
        }

        @jax.jit
        def full2_n(p, s, bt, k):
            def body(c, _):
                p2, s2, m, _ = train_step2(c[0], c[1], bt, k, 1.0)
                return (p2, s2), m["loss"]
            (p, s), losses = jax.lax.scan(body, (p, s), None, length=iters)
            return losses[-1]

        timed(f"s2vt-att PADDED-1024 train step B={b}", full2_n, params2,
              opt_state2, batch, key, flops_of=True, batch=b)

    return 0


if __name__ == "__main__":
    sys.exit(main())
