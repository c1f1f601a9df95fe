"""Train-time bf16 residual stream (transformer, round 4).

Under compute_dtype=bfloat16 the layer-scan backward used to stack six f32
(layers, B, N, 4096) encoder-stream saves — 8.4 GiB at B=512, the exact
allocations in the on-chip OOM dump (onchip_r4/bench_train_tf_remat.log;
reproduced by scripts/diag_tf_saves.py). The stream now rides in the compute
dtype at train (norm internals stay f32; norms are rematerialized so their
backward recomputes from the bf16 carry). Contracts:

  1. f32 compute is BITWISE untouched (casts are no-ops, no checkpoint):
     every parity/lockstep claim survives unchanged.
  2. VCR_TF_F32_STREAM=1 restores the historical f32-stream program
     bitwise (the escape hatch if the bf16 stream measures worse on-chip).
  3. The bf16-stream step tracks the f32-stream step within a small
     envelope (same argmax predictions on a well-separated toy problem).
  4. Eval/decode paths never see the cast (train=False is dtype-identical
     regardless of the env toggle).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcr_tpu.models import base, transformer as trm
from vcr_tpu.nn.layers import torch_norm
from vcr_tpu.train import optim
from vcr_tpu.train.step import build_step_fns


def _spec(tiny_vocab, cdtype):
    return base.ModelSpec(
        arch="transformer", vocab_size=tiny_vocab.vocab_size,
        embed_size=tiny_vocab.embed_size, hidden_size=16, vid_feat_size=12,
        max_len=8, num_frames=4, dropout_p=0.2, sos_id=tiny_vocab.sos_id,
        compute_dtype=cdtype, tf_layers=2, tf_heads=2)


def _batch(spec, b=6):
    r = np.random.default_rng(7)
    return {"vid_feats": jnp.asarray(
                r.standard_normal((b, spec.num_frames, spec.vid_feat_size)),
                jnp.float32),
            "sent": jnp.asarray(r.integers(0, spec.vocab_size,
                                           (b, spec.max_len)), jnp.int32),
            "sent_len": jnp.full((b,), 5, jnp.int32),
            "valid": jnp.ones((b,), jnp.float32)}


def _run_step(spec, tiny_vocab, monkeypatch, flag):
    monkeypatch.setenv("VCR_TF_F32_STREAM", flag)
    params = trm.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    opt = optim.build_optimizer("adam", 1e-3, 0.0, 1.0)
    ostate = opt.init(params)
    ts, _ = build_step_fns("transformer", spec, opt, 0.0, 0.0)
    p2, s2, m, _ = jax.jit(lambda p, s, b, k: ts(p, s, b, k, 1.0))(
        params, ostate, _batch(spec), jax.random.PRNGKey(3))
    return jax.device_get(p2), float(m["loss"])


def test_f32_compute_bitwise_unaffected(tiny_vocab, rng, monkeypatch):
    """Contract 1+2 at f32: the stream cast and norm remat are inert, so the
    toggle changes nothing — bitwise."""
    spec = _spec(tiny_vocab, "float32")
    p_def, l_def = _run_step(spec, tiny_vocab, monkeypatch, "0")
    p_f32, l_f32 = _run_step(spec, tiny_vocab, monkeypatch, "1")
    assert l_def == l_f32
    for a, b in zip(jax.tree_util.tree_leaves(p_def),
                    jax.tree_util.tree_leaves(p_f32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_stream_tracks_f32_stream(tiny_vocab, rng, monkeypatch):
    """Contract 3: under bf16 compute, the bf16-stream step's loss and
    updated params stay within a bf16-quantum envelope of the f32-stream
    step's (same matmul precision in both — only the residual carries and
    norm arithmetic width differ)."""
    spec = _spec(tiny_vocab, "bfloat16")
    p_bf, l_bf = _run_step(spec, tiny_vocab, monkeypatch, "0")
    p_f32, l_f32 = _run_step(spec, tiny_vocab, monkeypatch, "1")
    assert np.isfinite(l_bf) and np.isfinite(l_f32)
    assert abs(l_bf - l_f32) / max(abs(l_f32), 1e-6) < 0.05
    for a, b in zip(jax.tree_util.tree_leaves(p_bf),
                    jax.tree_util.tree_leaves(p_f32)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # adam normalizes per-leaf step size; updates differ at most by a
        # fraction of the lr-scale — assert the params stayed close
        assert np.max(np.abs(a - b)) < 5e-3, np.max(np.abs(a - b))


def test_eval_forward_ignores_stream_toggle(tiny_vocab, rng, monkeypatch):
    """Contract 4: train=False never casts the stream — both env settings
    produce the bf16-compute eval logits bitwise."""
    spec = _spec(tiny_vocab, "bfloat16")
    params = trm.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    batch = _batch(spec)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("VCR_TF_F32_STREAM", flag)
        outs[flag] = np.asarray(jax.jit(
            lambda p, v: trm.apply(p, spec, v, train=False))(
                params, batch["vid_feats"]))
    np.testing.assert_array_equal(outs["0"], outs["1"])


def test_torch_norm_dtype_preserving(rng):
    """torch_norm returns x.dtype and computes internals in f32: the bf16
    result equals the f32 result cast to bf16."""
    x32 = jax.random.normal(jax.random.PRNGKey(1), (4, 9), jnp.float32)
    p = {"alpha": jnp.full((9,), 1.3, jnp.float32),
         "bias": jnp.full((9,), -0.2, jnp.float32)}
    y32 = torch_norm(p, x32)
    assert y32.dtype == jnp.float32
    xb = x32.astype(jnp.bfloat16)
    yb = torch_norm(p, xb)
    assert yb.dtype == jnp.bfloat16
    expect = torch_norm(p, xb.astype(jnp.float32)).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(yb, np.float32),
                                  np.asarray(expect, np.float32))


def test_train_stream_dtype_is_compute_dtype(tiny_vocab, rng, monkeypatch):
    """The encoder output at train is bf16 under bf16 compute (the stream
    cast reached the whole stack), f32 at eval."""
    monkeypatch.delenv("VCR_TF_F32_STREAM", raising=False)
    spec = _spec(tiny_vocab, "bfloat16")
    params = trm.init_params(jax.random.PRNGKey(0), spec, tiny_vocab.vectors)
    v = _batch(spec)["vid_feats"]
    mask = trm.create_masks_inp(v)
    eo_train = trm.encode(params, spec, v, mask, jax.random.PRNGKey(0), True)
    eo_eval = trm.encode(params, spec, v, mask, jax.random.PRNGKey(0), False)
    assert eo_train.dtype == jnp.bfloat16
    assert eo_eval.dtype == jnp.float32
