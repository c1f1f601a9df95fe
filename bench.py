"""Benchmark: MSVD captions/sec/chip for the flagship S2VT greedy decode.

Measures the end-to-end jitted inference step (features -> caption tokens) on
one real TPU chip at the reference's model dimensions (BASELINE.json config #1:
S2VT greedy on MSVD-VGG 4096-d features, H=512, N=30 frames, L=20 tokens,
vocab ~9k) in bfloat16 compute with a serving-sized batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is an engineering estimate of the PyTorch reference on a V100: its decode runs
50 sequential Python-loop steps (30 encode + 20 decode, S2VTModel.py:121-177)
with ~6 small kernel launches each; at a measured-typical ~60µs/launch plus
cuDNN GRU cell time this bounds a bsize-32 batch near ~10ms  => ~3,000
captions/s. The ≥5x target (BASELINE.json) therefore means ≥15,000 captions/s.
"""

import json

from vcr_tpu.utils.benchutil import emit_row
import os
import sys
import time

import numpy as np

EST_V100_REFERENCE_CAPS_PER_SEC = 3000.0


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vcr_tpu.utils import backend_probe

    # Probe the backend in a subprocess BEFORE touching jax here: a dead axon
    # tunnel hangs rather than errors, and round 2 lost its bench artifact to
    # a single un-retried init failure (VERDICT.md). 3 attempts, 60s backoff.
    ok, diag = backend_probe.ensure_backend()
    if not ok:
        backend_probe.emit_failure_json(
            metric="MSVD S2VT greedy captions/sec/chip", unit="captions/s",
            diag=diag)
        sys.exit(1)

    import jax

    from vcr_tpu.models import s2vt
    from __graft_entry__ import _make_spec_and_params

    batch = int(os.environ.get("VCR_BENCH_BATCH", "2048"))
    use_pallas = os.environ.get("VCR_BENCH_PALLAS", "1") == "1"
    spec, params = _make_spec_and_params(
        vocab_size=9000, embed_size=300, hidden=512, vid_feat=4096,
        max_len=20, num_frames=30, compute_dtype="bfloat16", vocab_pad_to=128,
        use_pallas=use_pallas)

    import jax.numpy as jnp

    from vcr_tpu.utils import benchutil

    rng = np.random.default_rng(0)
    # chunked upload honors VCR_UPLOAD_CHUNK_MB (B=2048 is ~1 GB of features;
    # the tunnel 413-rejects very large single requests) — one-shot by default
    vid_feats = benchutil.chunked_device_put(
        rng.standard_normal((batch, 30, 4096)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = jax.device_put(params)

    iters = int(os.environ.get("VCR_BENCH_ITERS", "20"))

    # On-device timing: N inference iterations chained inside ONE jit (input
    # perturbed per iter to defeat CSE). This removes the ~24ms host<->TPU
    # tunnel round-trip from the measurement — the loop runs entirely on chip.
    @jax.jit
    def run_n(params, vid_feats):
        def body(c, _):
            x = (vid_feats * (1.0 + c * 1e-9)).astype(vid_feats.dtype)
            tokens = s2vt.apply(params, spec, x, train=False, emit="tokens")
            return tokens.astype(jnp.float32).ravel()[0] * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    np.asarray(run_n(params, vid_feats))  # compile + warm
    dt = float("inf")
    for _ in range(3):  # best-of-3 timed repeats (tunnel jitter smoothing)
        t0 = time.perf_counter()
        np.asarray(run_n(params, vid_feats))
        dt = min(dt, time.perf_counter() - t0)

    flops = benchutil.jaxpr_flops(run_n, params, vid_feats)  # all `iters`
    mfu = benchutil.mfu(flops, dt, jax.devices()[0])

    caps_per_sec = batch * iters / dt
    out = {
        "metric": "MSVD S2VT greedy captions/sec/chip (feats->tokens, B=%d)" % batch,
        "value": round(caps_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps_per_sec / EST_V100_REFERENCE_CAPS_PER_SEC, 3),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    emit_row(out)


if __name__ == "__main__":
    main()
