"""Optimizer construction.

Reference uses torch.optim.Adam(lr, weight_decay) only (train.py:104-107), with
grads clipped to a global max-norm *before* the step (train.py:159). Torch
Adam's weight_decay is L2-into-gradient (not AdamW), applied after clipping —
the optax chain below reproduces that ordering exactly:

    clip_by_global_norm(max_norm) -> add_decayed_weights(wd) -> adam -> -lr
"""

from __future__ import annotations

import optax


def build_optimizer(name: str, lr: float, wd: float, max_norm: float,
                    momentum: float = 0.9) -> optax.GradientTransformation:
    if name == "adam":
        return optax.chain(
            optax.clip_by_global_norm(max_norm),
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )
    if name == "sgd":  # the reference parses --momentum but only wires adam
        return optax.chain(
            optax.clip_by_global_norm(max_norm),
            optax.add_decayed_weights(wd),
            optax.trace(decay=momentum),
            optax.scale(-lr),
        )
    raise NotImplementedError("Unknown optim type")  # train.py:107
