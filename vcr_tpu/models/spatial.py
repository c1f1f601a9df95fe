"""SpatialNet: spatial attention over YOLO grid features, spliced into a captioner.

TPU-native rebuild of reference model/SpatialNet.py:14-142:

* 2x (conv3x3 + BatchNorm + ReLU) trunk F->H over all B·N frames at once
  (SpatialNet.py:76-82, 106-113) — one batched XLA conv instead of a loop.
* Per-frame Bahdanau attention with the encoder hidden state as query over the
  K² grid cells; keys are the conv features (projected inside the attention,
  SpatialNet.py:39), values are the RAW features, so the context lives in raw
  feature space F (SpatialNet.py:50); the context feeds the captioner's
  encode_step (SpatialNet.py:127). The reference's 30-iteration Python loop
  becomes one lax.scan carrying the encoder state.
* Per-frame K×K attention maps are emitted as scan ys -> seq_alphas
  (B, N, K, K) (SpatialNet.py:134-138).
* Decoding delegates to the wrapped captioner's decode (SpatialNet.py:140).

BatchNorm running stats are functional state: apply() returns them as part of
the aux dict and the train step merges them back into params.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.models import base, s2vt, s2vt_att
from vcr_tpu.nn.attention import bahdanau_attend, bahdanau_init, bahdanau_project_keys
from vcr_tpu.nn.layers import batchnorm, batchnorm_init, conv2d, conv2d_init


def _base_module(spec: base.ModelSpec):
    if spec.base_arch == "s2vt":
        return s2vt
    if spec.base_arch == "s2vt-att":
        return s2vt_att
    raise NotImplementedError("unknown video captioning arch")  # SpatialNet.py:73-74


def init_params(key: jax.Array, spec: base.ModelSpec, glove_vectors) -> dict:
    k_cap, k_c1, k_c2, k_att = jax.random.split(key, 4)
    return {
        "caption_net": _base_module(spec).init_params(k_cap, spec, glove_vectors),
        "conv1": conv2d_init(k_c1, spec.vid_feat_size, spec.hidden_size, 3),
        "bn1": batchnorm_init(spec.hidden_size),
        "conv2": conv2d_init(k_c2, spec.hidden_size, spec.hidden_size, 3),
        "bn2": batchnorm_init(spec.hidden_size),
        "attention": bahdanau_init(k_att, spec.hidden_size),
    }


def conv_trunk(params, spec: base.ModelSpec, frames: jax.Array, train: bool):
    """frames (B·N, F, K, K) -> (feats (B·N, H, K, K), new_bn_state)."""
    x = conv2d(params["conv1"], frames, compute_dtype=spec.cdtype)
    x, bn1 = batchnorm(params["bn1"], x, train)
    x = jax.nn.relu(x)
    x = conv2d(params["conv2"], x, compute_dtype=spec.cdtype)
    x, bn2 = batchnorm(params["bn2"], x, train)
    x = jax.nn.relu(x)
    return x, {"bn1": bn1, "bn2": bn2}


def encode_spatial(params, spec: base.ModelSpec, vid_feats: jax.Array, train: bool):
    """vid_feats (B, N, F, K, K) -> (output1 (N, B, H), rnn_state (B, H),
    seq_alphas (B, N, K, K), new_bn_state)."""
    b, n, f, k, _ = vid_feats.shape
    num_cells = k * k

    conv_feats, bn_state = conv_trunk(
        params, spec, vid_feats.reshape(b * n, f, k, k), train)
    conv_feats = conv_feats.reshape(b, n, spec.hidden_size, num_cells)
    conv_feats = jnp.transpose(conv_feats, (0, 1, 3, 2))   # (B, N, K², H)
    raw_feats = vid_feats.reshape(b, n, f, num_cells)
    raw_feats = jnp.transpose(raw_feats, (0, 1, 3, 2))      # (B, N, K², F)

    # Key projection is per-call in the reference (SpatialNet.py:39) but the
    # keys don't depend on the scan state — hoist it: one MXU matmul for all
    # B·N·K² cells instead of N small ones.
    proj_keys = bahdanau_project_keys(params["attention"], conv_feats, spec.cdtype)

    cap = _base_module(spec)
    state0 = jnp.zeros((b, spec.hidden_size), dtype=jnp.float32)

    def step(state, inp):
        pk_t, raw_t = inp  # (B, K², H), (B, K², F)
        context, alphas = bahdanau_attend(params["attention"], state, pk_t, raw_t,
                                          spec.cdtype)      # (B, F), (B, K²)
        out, state = cap.encode_step(params["caption_net"], spec, context, state)
        return state, (out, alphas)

    xs = (jnp.transpose(proj_keys, (1, 0, 2, 3)), jnp.transpose(raw_feats, (1, 0, 2, 3)))
    rnn_state, (output1, alphas) = jax.lax.scan(step, state0, xs)
    seq_alphas = jnp.transpose(alphas, (1, 0, 2)).reshape(b, n, k, k)
    return output1, rnn_state, seq_alphas, bn_state


def apply(
    params,
    spec: base.ModelSpec,
    vid_feats: jax.Array,
    s: Optional[jax.Array] = None,
    s_len: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,
    emit: str = "logits",      # "tokens": serving-only (B, L) int32 output,
                               # skipping the B*L*V logits materialization
) -> Tuple[jax.Array, jax.Array, dict]:
    """-> (logits (B, L, vocab), seq_alphas (B, N, K, K), new_bn_state)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    output1, rnn_state, seq_alphas, bn_state = encode_spatial(
        params, spec, vid_feats, train)
    cap = _base_module(spec)
    if spec.base_arch == "s2vt":
        logits = cap.decode(params["caption_net"], spec, output1, rnn_state, s,
                            rng=rng, train=train,
                            teacher_force_prob=teacher_force_prob, emit=emit)
    else:
        # s2vt-att decode wants (B, N, H) encoder outs (S2VTAttModel.py:231-243)
        logits = cap.decode(params["caption_net"], spec,
                            jnp.transpose(output1, (1, 0, 2)), rnn_state, s,
                            rng=rng, train=train, emit=emit)
    return logits, seq_alphas, bn_state


base.register("spatial", init_params, apply)
