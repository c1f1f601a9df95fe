"""Secondary benchmark: S2VT training-step throughput on one TPU chip.

(The driver's headline benchmark is bench.py — inference. This measures the
jitted train step — forward + backward + Adam + clip — at the reference's
training configuration, reporting videos/sec and step time.)
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _make_spec_and_params
    from vcr_tpu.train import optim
    from vcr_tpu.train.step import build_step_fns

    batch = int(os.environ.get("VCR_BENCH_BATCH", "512"))
    spec, params = _make_spec_and_params(
        vocab_size=9000, embed_size=300, hidden=512, vid_feat=4096,
        max_len=20, num_frames=30, compute_dtype="bfloat16", vocab_pad_to=128)

    import optax

    from vcr_tpu.models import s2vt
    from vcr_tpu.train import losses

    optimizer = optim.build_optimizer("adam", 2e-3, 4e-5, 1.0)
    params = jax.device_put(params)
    opt_state = optimizer.init(params)
    del build_step_fns  # the loop below inlines the same step math on device

    rng = np.random.default_rng(0)
    batch_data = {
        "vid_feats": jax.device_put(
            rng.standard_normal((batch, 30, 4096)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "sent": jax.device_put(rng.integers(0, 9000, (batch, 20)).astype(np.int32)),
        "sent_len": jax.device_put(np.full((batch,), 12, np.int32)),
        "valid": jax.device_put(np.ones((batch,), np.float32)),
    }

    iters = int(os.environ.get("VCR_BENCH_ITERS", "10"))

    def loss_fn(p, key):
        logits = s2vt.apply(p, spec, batch_data["vid_feats"], batch_data["sent"],
                            batch_data["sent_len"], rng=key, train=True,
                            teacher_force_prob=1.0)
        return losses.masked_cross_entropy(logits, batch_data["sent"],
                                           batch_data["sent_len"],
                                           batch_data["valid"])

    # N optimization steps chained inside one jit — removes the ~24ms/call
    # host<->TPU tunnel dispatch from the measurement (see bench.py)
    @jax.jit
    def run_n(params, opt_state, key):
        def body(carry, i):
            p, o = carry
            grads = jax.grad(loss_fn)(p, jax.random.fold_in(key, i))
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), None
        (p, _), _ = jax.lax.scan(body, (params, opt_state), jnp.arange(iters))
        return p["linear"]["b"][0]

    np.asarray(run_n(params, opt_state, jax.random.PRNGKey(0)))  # compile
    t0 = time.perf_counter()
    np.asarray(run_n(params, opt_state, jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0

    from vcr_tpu.utils import benchutil
    flops = benchutil.jaxpr_flops(run_n, params, opt_state, jax.random.PRNGKey(1))
    mfu = benchutil.mfu(flops, dt, jax.devices()[0])

    out = {
        "metric": f"S2VT train step videos/sec/chip (B={batch}, bf16)",
        "value": round(batch * iters / dt, 2),
        "unit": "videos/s",
        "step_ms": round(dt / iters * 1e3, 2),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
