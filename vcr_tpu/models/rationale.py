"""RationaleNet: Gumbel-Softmax temporal rationale over frames + a wrapped captioner.

TPU-native rebuild of reference model/RationaleNet.py:14-106:

* Generator: BiLSTM over frames -> dropout -> linear -> 2 logits per frame ->
  Gumbel-Softmax (soft while training, HARD straight-through at eval —
  RationaleNet.py:49-50); channel 1 scales the frame features
  (RationaleNet.py:52-53).
* The selected features feed an s2vt or s2vt-att captioner
  (RationaleNet.py:73-78, 103-104). Warm-starting from a pretrained captioner
  checkpoint is done at the params level in the train loop (reference
  RationaleNet.py:80-82 loads a state_dict).

Returns (logits, probs) exactly like the reference forward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.models import base, s2vt, s2vt_att
from vcr_tpu.nn.gumbel import gumbel_softmax
from vcr_tpu.nn.layers import dense, dense_init, dropout
from vcr_tpu.nn.rnn import bilstm_init, bilstm_sequence


def _base_module(spec: base.ModelSpec):
    if spec.base_arch == "s2vt":
        return s2vt
    if spec.base_arch == "s2vt-att":
        return s2vt_att
    raise NotImplementedError("unknown video captioning arch")  # RationaleNet.py:77-78


def init_params(key: jax.Array, spec: base.ModelSpec, glove_vectors) -> dict:
    k_cap, k_rnn, k_lin = jax.random.split(key, 3)
    return {
        "caption_net": _base_module(spec).init_params(k_cap, spec, glove_vectors),
        "gen": {
            "rnn": bilstm_init(k_rnn, spec.vid_feat_size, spec.hidden_size),
            "linear": dense_init(k_lin, 2 * spec.hidden_size, 2),
        },
    }


def generator(params, spec: base.ModelSpec, vid_feats: jax.Array,
              rng: jax.Array, train: bool,
              gumbel_noise: Optional[jax.Array] = None,
              ) -> Tuple[jax.Array, jax.Array]:
    """vid_feats (B, N, V) -> (sel_vid_feats (B, N, V), probs (B, N, 2)).

    ``gumbel_noise``: optional pre-drawn Gumbel(0,1) noise (B, N, 2) replacing
    the internal draw — the cross-framework parity hook (torch's
    F.gumbel_softmax stream cannot be seed-matched; injecting identical noise
    into both sides makes forward AND training lockstep-testable)."""
    k_drop, k_gumbel = jax.random.split(rng)
    xs = jnp.transpose(vid_feats, (1, 0, 2))                       # (N, B, V)
    if spec.use_pallas:
        from vcr_tpu.ops.pallas_gru import bilstm_sequence_pallas

        out = bilstm_sequence_pallas(params["rnn"], xs,
                                     compute_dtype=spec.cdtype)    # (N, B, 2H)
    else:
        out = bilstm_sequence(params["rnn"], xs, compute_dtype=spec.cdtype)
    out = dropout(k_drop, out, spec.dropout_p, train)
    out = jnp.transpose(out, (1, 0, 2))                            # (B, N, 2H)
    logits = dense(params["linear"], out, spec.cdtype)             # (B, N, 2)
    hard = not train  # RationaleNet.py:49: soft in train, hard at eval
    probs = gumbel_softmax(k_gumbel, logits, tau=spec.tau, hard=hard,
                           noise=gumbel_noise)
    sel = vid_feats * probs[:, :, 1][..., None]
    return sel, probs


def apply(
    params,
    spec: base.ModelSpec,
    vid_feats: jax.Array,
    s: Optional[jax.Array] = None,
    s_len: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    teacher_force_prob: jax.Array | float = 1.0,
    gumbel_noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """-> (logits (B, L, vocab), probs (B, N, 2)) (RationaleNet.py:86-106).
    ``gumbel_noise``: see generator() — cross-framework parity hook."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_gen, k_cap = jax.random.split(rng)
    vid_feats = vid_feats.astype(spec.cdtype)  # bf16 feed (fp32-mode no-op)
    sel, probs = generator(params["gen"], spec, vid_feats, k_gen, train,
                           gumbel_noise=gumbel_noise)
    logits = _base_module(spec).apply(
        params["caption_net"], spec, sel, s, s_len,
        rng=k_cap, train=train, teacher_force_prob=teacher_force_prob)
    return logits, probs


base.register("rationale", init_params, apply)
