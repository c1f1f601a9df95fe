"""Selective ff rematerialization (transformer train, round 4).

jax.checkpoint around just the ff block recomputes its residuals in the
backward instead of saving the per-layer (B, N, d_ff) relu output + dropout
mask (the largest transformer-train temporaries —
onchip_r4/bench_train_tf_remat.log's B=512 OOM dump). The dropout keys are
explicit, so the recompute is deterministic: the ENTIRE train step
(params', opt_state', loss) must be bitwise identical with the remat on or
off. Plain autodiff is the DEFAULT (the remat measured 2-5% slower
on-chip); VCR_TF_FF_REMAT=1 opts into the memory-saving form.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import base, transformer as trm
from vcr_tpu.train import optim
from vcr_tpu.train.step import build_step_fns


@pytest.mark.parametrize("cdtype", ["float32", "bfloat16"])
def test_ff_remat_step_bitwise_identical(tiny_vocab, rng, cdtype,
                                         monkeypatch):
    spec = base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.2, sos_id=tiny_vocab.sos_id,
        compute_dtype=cdtype, tf_layers=2, tf_heads=2)
    params = trm.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    opt = optim.build_optimizer("adam", 1e-3, 0.0, 1.0)
    ostate = opt.init(params)
    feats = np.random.default_rng(5).standard_normal((6, 4, 12))
    batch = {"vid_feats": jnp.asarray(feats, jnp.float32),
             "sent": jnp.asarray(np.random.default_rng(6).integers(
                 0, spec.vocab_size, (6, 8)), jnp.int32),
             "sent_len": jnp.full((6,), 5, jnp.int32),
             "valid": jnp.ones((6,), jnp.float32)}
    key = jax.random.PRNGKey(3)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("VCR_TF_FF_REMAT", flag)
        ts, _ = build_step_fns("transformer", spec, opt, 0.0, 0.0)
        p2, s2, m, _ = jax.jit(
            lambda p, s, b, k: ts(p, s, b, k, 1.0))(params, ostate, batch,
                                                    key)
        outs[flag] = (jax.device_get((p2, s2)), float(m["loss"]))

    assert outs["1"][1] == outs["0"][1]
    for a, b in zip(jax.tree_util.tree_leaves(outs["1"][0]),
                    jax.tree_util.tree_leaves(outs["0"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
