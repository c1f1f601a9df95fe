"""GRU/LSTM gate rematerialization (VCR_GRU_GATES_REMAT=1, round 4).

jax.checkpoint around the per-step gate math makes the scan backward
recompute r/z/n (and the recurrent matmul) from x_gates + h instead of
stacking ~5 f32 (T, B, H) intermediates per GRU scan
(scripts/diag_train_saves.py: s2vt 2.4 GiB -> much less per step at B=1024).
The recompute is the identical f32 op sequence, so the ENTIRE train step —
updated params, opt state, loss — must be bitwise identical with the flag on
or off, for the GRU families. Opt-in until the on-chip A/B decides the
default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import base
from vcr_tpu.train import optim
from vcr_tpu.train.step import build_step_fns


@pytest.mark.parametrize("arch", ["s2vt", "s2vt-att", "rationale"])
def test_gate_remat_step_bitwise_identical(tiny_vocab, rng, arch,
                                           monkeypatch):
    spec = base.ModelSpec(
        arch=arch, vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.2, sos_id=tiny_vocab.sos_id,
        compute_dtype="bfloat16", base_arch="s2vt")
    init_fn, _ = base.build_model(arch)
    params = init_fn(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    opt = optim.build_optimizer("adam", 1e-3, 0.0, 1.0)
    ostate = opt.init(params)
    r = np.random.default_rng(5)
    batch = {"vid_feats": jnp.asarray(r.standard_normal((6, 4, 12)),
                                      jnp.float32),
             "sent": jnp.asarray(r.integers(0, spec.vocab_size, (6, 8)),
                                 jnp.int32),
             "sent_len": jnp.full((6,), 5, jnp.int32),
             "valid": jnp.ones((6,), jnp.float32)}
    key = jax.random.PRNGKey(3)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("VCR_GRU_GATES_REMAT", flag)
        ts, _ = build_step_fns(arch, spec, opt, 1.0, 1.0)
        p2, s2, m, _ = jax.jit(
            lambda p, s, b, k: ts(p, s, b, k, 1.0))(params, ostate, batch,
                                                    key)
        outs[flag] = (jax.device_get((p2, s2)), float(m["loss"]))

    assert outs["1"][1] == outs["0"][1]
    for a, b in zip(jax.tree_util.tree_leaves(outs["1"][0]),
                    jax.tree_util.tree_leaves(outs["0"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2vt_train_defaults_to_gate_remat(tiny_vocab, monkeypatch):
    """Round-5 policy: the S2VT AND S2VT-att train steps trace their GRU
    gate math under jax.checkpoint BY DEFAULT (interleaved on-chip A/B,
    onchip_r5/ab_summary.log: s2vt remat-off -11.5%, s2vt-att remat +2.8%
    at 1.4% spread; nn/rnn.gate_remat_default), rationale keeps the
    opt-in (unmeasured extra generator work), and VCR_GRU_GATES_REMAT=0/1
    overrides. Detected via the remat primitive in the traced train
    step's jaxpr."""
    import jax
    import numpy as np

    from vcr_tpu.models import base
    from vcr_tpu.train import optim
    from vcr_tpu.train.step import build_step_fns

    def traced(arch, env=None):
        if env is None:
            monkeypatch.delenv("VCR_GRU_GATES_REMAT", raising=False)
        else:
            monkeypatch.setenv("VCR_GRU_GATES_REMAT", env)
        spec = base.ModelSpec(
            arch=arch, vocab_size=tiny_vocab.vocab_size,
            embed_size=tiny_vocab.embed_size, hidden_size=8,
            vid_feat_size=12, max_len=6, num_frames=4, dropout_p=0.0,
            sos_id=tiny_vocab.sos_id, compute_dtype="float32")
        params = base.build_model(arch)[0](jax.random.PRNGKey(0), spec,
                                           tiny_vocab.vectors)
        opt = optim.build_optimizer("adam", 1e-3, 0.0, 1.0)
        ostate = opt.init(params)
        train_step, _ = build_step_fns(arch, spec, opt, static_tf=1.0)
        rng = np.random.default_rng(0)
        batch = {
            "vid_feats": rng.standard_normal((4, 4, 12)).astype(np.float32),
            "sent": rng.integers(0, spec.vocab_size, (4, 6)).astype(np.int32),
            "sent_len": np.full((4,), 4, np.int32),
            "valid": np.ones((4,), np.float32),
        }
        tr = train_step.trace(params, ostate, batch, jax.random.PRNGKey(0),
                              1.0)
        return str(tr.jaxpr)

    assert "remat" in traced("s2vt")
    assert "remat" in traced("s2vt-att")
    assert "remat" not in traced("s2vt", env="0")
    assert "remat" not in traced("s2vt-att", env="0")
