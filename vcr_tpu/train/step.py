"""Jitted train/eval step builders — one generic factory replacing the three
copy-pasted loops of the reference (train.py:32-44, train_rationale.py:30-44,
train_spatial.py:30-39).

Each step is a pure function: params/opt_state in, params/opt_state/metrics/
predictions out. Buffers are donated; metrics stay on device until the logger
window flushes (eliminating the reference's per-batch host syncs,
train.py:151,162 / SURVEY.md §3.1).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vcr_tpu.models import base
from vcr_tpu.train import losses


def _forward(model_name: str, fwd, params, batch, rng, tf_prob,
             lambda_brev: float, lambda_cont: float):
    """Run a bound forward and compute (loss, metrics, pred, aux) per workload.
    ``fwd(params, vid_feats, sent, sent_len, rng, tf_prob)`` carries only array
    arguments, so it can be wrapped with jax.checkpoint for rematerialization."""
    valid = batch["valid"]
    out = fwd(params, batch["vid_feats"], batch["sent"], batch["sent_len"],
              rng, tf_prob)
    aux: Dict = {}
    if model_name == "rationale":
        logits, probs = out
        ce = losses.masked_cross_entropy(logits, batch["sent"], batch["sent_len"], valid)
        brev = losses.brevity_loss(probs, valid) * lambda_brev
        cont = losses.continuity_loss(probs, valid) * lambda_cont
        loss = ce + brev + cont  # train_rationale.py:40
        metrics = {
            "loss": loss, "loss_ce": ce, "loss_brev": brev, "loss_cont": cont,
            "len": losses.rationale_length(probs, valid),
        }
    elif model_name == "spatial":
        logits, _seq_alphas, bn_state = out
        loss = losses.masked_cross_entropy(logits, batch["sent"], batch["sent_len"], valid)
        metrics = {"loss": loss}
        aux["bn_state"] = bn_state
    else:  # plain captioners
        logits = out
        loss = losses.masked_cross_entropy(logits, batch["sent"], batch["sent_len"], valid)
        metrics = {"loss": loss}
    metrics["acc"] = losses.masked_accuracy(logits, batch["sent"], batch["sent_len"], valid)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return loss, metrics, pred, aux


def _merge_bn(params, bn_state):
    """Overwrite BatchNorm running stats with the fresh ones from the forward
    (they are state, not gradient-trained parameters)."""
    new = dict(params)
    for bn_name, stats in bn_state.items():
        sub = dict(new[bn_name])
        sub["mean"], sub["var"] = stats["mean"], stats["var"]
        new[bn_name] = sub
    return new


def build_step_fns(
    model_name: str,
    spec: base.ModelSpec,
    optimizer: optax.GradientTransformation,
    lambda_brev: float = 1.0,
    lambda_cont: float = 1.0,
    remat: bool = False,
    grad_accum: int = 1,
    static_tf: float | None = None,
) -> Tuple[Callable, Callable]:
    """-> (train_step, eval_step).

    train_step(params, opt_state, batch, rng, tf_prob)
        -> (params, opt_state, metrics, pred)
    eval_step(params, batch, rng=None) -> (metrics, pred)   # greedy
        rng matters only for stochastic-eval models: RationaleNet's torch
        eval draws FRESH Gumbel noise per forward (RationaleNet.py:50), so
        validation passes a per-batch key; None falls back to the model's
        fixed default key (deterministic families ignore it entirely).

    remat: rematerialize the forward under the backward pass (jax.checkpoint)
    — trades ~1 extra forward of FLOPs for not storing per-step activations in
    HBM; useful for long sequences / large batches.

    grad_accum: split each batch into N sequential microbatches (lax.scan)
    and apply ONE optimizer update from their combined gradient. The masked
    losses are means over VALID rows, so microbatch gradients are combined
    weighted by each microbatch's valid count — the result is EXACTLY the
    full-batch gradient (padding-only microbatches get weight 0), at 1/N the
    activation memory and emitted program size. Metrics combine with the same
    weights; dropout/teacher-force keys fold in the microbatch index;
    SpatialNet's BN running stats follow the LAST microbatch (torch
    accumulation semantics — the one intentional deviation from one big
    batch).

    static_tf: when the teacher-force schedule is a compile-time constant
    (the default — schedule_sample off means tf ≡ 1.0), pass it here as a
    Python float instead of the traced per-call `tf_prob`. The models then
    see a static value and can specialize: at tf == 1.0 the GRU decoders
    hoist the vocab projection out of the decode scan into one big MXU
    matmul (bit-identical — see s2vt.decode_from_states). The runtime
    `tf_prob` argument is ignored at train when this is set.
    """
    _, apply_fn = base.build_model(model_name)

    def _bound(train: bool):
        def fn(params, vid_feats, sent, sent_len, rng, tf_prob):
            if train and static_tf is not None:
                tf_prob = static_tf
            # S2VT and S2VT-att train with GRU gate remat by DEFAULT
            # (bitwise-identical step; the round-5 INTERLEAVED A/B —
            # onchip_r5/ab_summary.log, n=3 tight spreads — measured
            # remat-off at -11.5% for s2vt and remat at +2.8% for s2vt-att,
            # overturning two weather-noisy single-shot negatives).
            # rationale/spatial wrap these captioners but carry extra
            # generator/conv work the A/B never measured, so they keep the
            # opt-in. The scope is trace-time; VCR_GRU_GATES_REMAT
            # overrides either way.
            from vcr_tpu.nn.rnn import gate_remat_default

            with gate_remat_default(train and model_name in ("s2vt",
                                                             "s2vt-att")):
                return apply_fn(params, spec, vid_feats, sent, sent_len,
                                rng=rng, train=train,
                                teacher_force_prob=tf_prob)
        return fn

    train_fwd = jax.checkpoint(_bound(True)) if remat else _bound(True)
    eval_fwd = _bound(False)

    def loss_fn(params, batch, rng, tf_prob):
        loss, metrics, pred, aux = _forward(
            model_name, train_fwd, params, batch, rng, tf_prob,
            lambda_brev, lambda_cont)
        return loss, (metrics, pred, aux)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng, tf_prob):
        if grad_accum > 1:
            grads, metrics, pred, aux = _accum_grads(params, batch, rng,
                                                     tf_prob)
        else:
            grads, (metrics, pred, aux) = jax.grad(loss_fn, has_aux=True)(
                params, batch, rng, tf_prob)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if "bn_state" in aux:
            params = _merge_bn(params, aux["bn_state"])
        return params, opt_state, metrics, pred

    def _accum_grads(params, batch, rng, tf_prob):
        b = batch["vid_feats"].shape[0]
        if b % grad_accum:
            raise ValueError(
                f"batch size {b} not divisible by grad_accum={grad_accum}")
        m = b // grad_accum
        micro = jax.tree_util.tree_map(
            lambda v: v.reshape(grad_accum, m, *v.shape[1:]), batch)

        def body(carry, xs):
            g_acc, w_acc = carry
            mb, i = xs
            grads, (metrics, pred, aux) = jax.grad(loss_fn, has_aux=True)(
                params, mb, jax.random.fold_in(rng, i), tf_prob)
            n = jnp.sum(mb["valid"]).astype(jnp.float32)
            g_acc = jax.tree_util.tree_map(lambda a, g: a + g * n, g_acc,
                                           grads)
            return (g_acc, w_acc + n), (metrics, pred, aux, n)

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        (g_sum, w_sum), (ms, preds, auxs, ns) = jax.lax.scan(
            body, (zero_g, jnp.float32(0)),
            (micro, jnp.arange(grad_accum)))
        w_sum = jnp.maximum(w_sum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / w_sum, g_sum)
        weights = ns / w_sum
        metrics = {k: jnp.sum(v * weights) for k, v in ms.items()}
        pred = preds.reshape(b, *preds.shape[2:])
        aux = jax.tree_util.tree_map(lambda x: x[-1], auxs)
        return grads, metrics, pred, aux

    @jax.jit
    def eval_step(params, batch, rng=None):
        _, metrics, pred, _ = _forward(
            model_name, eval_fwd, params, batch, rng, 0.0,
            lambda_brev, lambda_cont)
        return metrics, pred

    return train_step, eval_step


def device_batch(batch: Dict) -> Dict:
    """Keep only the array fields of a pipeline batch (refs/vid_key/sent_raw
    stay on host for METEOR/logging)."""
    return {k: batch[k] for k in ("vid_feats", "sent", "sent_len", "valid")}
