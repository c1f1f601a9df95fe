"""Loss and metric primitives (pure jnp, fully jittable).

Math parity with reference train_utils.py:
* sentence mask from lengths            (train_utils.py:22-35)
* masked CE, per-sentence mean then batch mean (train_utils.py:37-54)
* masked token accuracy                  (train_utils.py:56-71)
* rationale continuity loss mean|z_t - z_{t-1}| (train_utils.py:73-83)
* rationale brevity loss mean(sum_t z_t) (train_utils.py:85-95)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sentence_mask(max_len: int, s_len: jax.Array) -> jax.Array:
    """(B,) lengths -> (B, L) float 0/1 mask."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < s_len[:, None]).astype(jnp.float32)


def masked_cross_entropy(logits: jax.Array, target: jax.Array, s_len: jax.Array,
                         valid: jax.Array | None = None) -> jax.Array:
    """logits (B, L, V), target (B, L) int, s_len (B,) -> scalar.

    Per-token CE is averaged within each sentence over its valid tokens, then
    averaged over the batch — exactly the reference's two-stage mean
    (train_utils.py:51, *not* the commented-out global mean).

    ``valid`` (B,) 0/1 excludes padding rows of a short final batch (the
    reference's DataLoader shrank the batch instead; fixed shapes keep XLA to
    one compilation)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = sentence_mask(logits.shape[1], s_len)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    per_sent = jnp.sum(nll * mask, axis=1) / denom
    if valid is None:
        return jnp.mean(per_sent)
    return jnp.sum(per_sent * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def masked_accuracy(logits: jax.Array, target: jax.Array, s_len: jax.Array,
                    valid: jax.Array | None = None) -> jax.Array:
    """Token accuracy over valid positions (global, not per-sentence)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == target).astype(jnp.float32)
    mask = sentence_mask(logits.shape[1], s_len)
    if valid is not None:
        mask = mask * valid[:, None]
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _row_mean(x: jax.Array, valid: jax.Array | None) -> jax.Array:
    if valid is None:
        return jnp.mean(x)
    return jnp.sum(x * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def continuity_loss(probs: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """probs (B, N, 2): mean |z_t - z_{t-1}| over the selection channel."""
    z = probs[:, :, 1]
    return _row_mean(jnp.mean(jnp.abs(z[:, 1:] - z[:, :-1]), axis=1), valid)


def brevity_loss(probs: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """probs (B, N, 2): mean over batch of sum_t z_t."""
    return _row_mean(jnp.sum(probs[:, :, 1], axis=1), valid)


def rationale_length(probs: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Mean selected-frame count (logged as 'len', train_rationale.py:37)."""
    return _row_mean(jnp.sum(probs[:, :, 1], axis=1), valid)
