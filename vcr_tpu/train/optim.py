"""Optimizer construction.

Reference uses torch.optim.Adam(lr, weight_decay) only (train.py:104-107), with
grads clipped to a global max-norm *before* the step (train.py:159). Torch
Adam's weight_decay is L2-into-gradient (not AdamW), applied after clipping —
the optax chain below reproduces that ordering exactly:

    clip_by_global_norm(max_norm) -> add_decayed_weights(wd) -> adam -> -lr
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """Exact ``torch.nn.utils.clip_grad_norm_`` semantics:

        scale = min(max_norm / (global_norm + 1e-6), 1.0)

    optax's ``clip_by_global_norm`` omits the ``1e-6`` in the denominator and
    only rescales when the norm strictly exceeds ``max_norm``; the torch form
    also shaves a hair off gradients whose norm is within 1e-6 *below* the
    threshold. The lockstep training-equivalence tests
    (tests/test_train_equivalence.py) hold to ~1e-5 over dozens of steps only
    with the torch formula, so we replicate it bit-for-bit."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        scale = jnp.minimum(max_norm / (g_norm + 1e-6), 1.0)
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


# Param-tree leaves that are torch *buffers*, not parameters: positional
# encoding tables ("pe", TransformerNet.py:110-123 register_buffer) and
# BatchNorm running stats ("mean"/"var", SpatialNet's nn.BatchNorm2d). Torch's
# optimizer/clip only ever see model.parameters(), so these must receive no
# Adam step, no weight decay, and must not count toward the clip norm.
_BUFFER_KEYS = frozenset({"pe", "mean", "var"})


def trainable_labels(params) -> dict:
    """Pytree of 'trainable'/'frozen' labels mirroring ``params``' structure,
    keyed on the leaf's dict key (see _BUFFER_KEYS).

    Special case: the reference Transformer creates decoder.norm AND
    decoder.norm_out but only ever calls norm_out in forward
    (TransformerNet.py:220-221,243). Its decoder.norm therefore has grad=None
    in torch, which torch.optim.Adam skips entirely — no step, no weight
    decay. Our autodiff produces an exact-zero grad instead, so without
    freezing, weight decay would silently train the dead norm away from its
    init (caught by the lockstep harness)."""

    def walk(node, key):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return "frozen" if key in _BUFFER_KEYS else "trainable"

    labels = walk(params, None)
    dec = params.get("decoder") if isinstance(params, dict) else None
    if isinstance(dec, dict) and "norm" in dec and "norm_out" in dec:
        labels["decoder"]["norm"] = jax.tree_util.tree_map(
            lambda _: "frozen", dec["norm"])
    return labels


def build_optimizer(name: str, lr: float, wd: float, max_norm: float,
                    momentum: float = 0.9) -> optax.GradientTransformation:
    if name == "adam":
        tx = optax.chain(
            clip_by_global_norm_torch(max_norm),
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )
    elif name == "sgd":  # the reference parses --momentum but only wires adam
        tx = optax.chain(
            clip_by_global_norm_torch(max_norm),
            optax.add_decayed_weights(wd),
            optax.trace(decay=momentum),
            optax.scale(-lr),
        )
    else:
        raise NotImplementedError("Unknown optim type")  # train.py:107
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, trainable_labels)
