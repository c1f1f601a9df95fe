"""Fused recurrent cells with exact torch gate semantics, built for the TPU.

Design (TPU-first, see SURVEY.md §3.2): the input-to-hidden projection for a
whole sequence is ONE large (T·B, I) @ (I, 3H) matmul on the MXU, done outside
the recurrence; ``lax.scan`` then carries only the hidden state and performs the
small (B, H) @ (H, 3H) recurrent matmul + VPU gate math per step. This replaces
the reference's cuDNN GRU/LSTM calls and its 20-30-iteration Python loops
(reference: model/S2VTModel.py:121-136, model/SpatialNet.py:120-132).

Gate math matches torch.nn.GRU / torch.nn.LSTM exactly (gate order r,z,n and
i,f,g,o) so that converted reference checkpoints decode token-for-token.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcr_tpu.nn import init as vinit
from vcr_tpu.nn.layers import vdot


# ---------------- GRU ----------------

def gru_init(key: jax.Array, input_size: int, hidden_size: int):
    """Params for a single-layer GRU. Weights stored transposed — (in, 3H) /
    (H, 3H) — for right-multiplication; gate order [r | z | n] as in torch."""
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": vinit.rnn_mat_init(k1, input_size, 3 * hidden_size),
        "w_hh": vinit.rnn_mat_init(k2, hidden_size, 3 * hidden_size),
        "b_ih": vinit.const_bias(3 * hidden_size),
        "b_hh": vinit.const_bias(3 * hidden_size),
    }


def _gru_gates_impl(x_gates: jax.Array, h: jax.Array, params,
                    compute_dtype=jnp.bfloat16, h_gates=None):
    if h_gates is None:
        h_gates = vdot(h, params["w_hh"], compute_dtype) + params["b_hh"]
    xr, xz, xn = jnp.split(x_gates, 3, axis=-1)
    hr, hz, hn = jnp.split(h_gates, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


# OPT-IN gate rematerialization (VCR_GRU_GATES_REMAT=1): jax.checkpoint
# around the per-step gate math, so the scan backward recomputes r/z/n and
# the (B, H) @ (H, 3H) recurrent matmul from x_gates + h instead of stacking
# the gate intermediates — scripts/diag_train_saves.py counts ~5 f32
# (T, B, H) stacks per GRU scan at the bench spec (s2vt: 2.4 GiB/step at
# B=1024, ~25% of the memory-bound step's byte traffic). The recompute is
# the identical f32 op sequence, so the train step is BITWISE unchanged
# (tests/test_gru_gates_remat.py). Opt-in until the on-chip A/B rows decide
# the default (the ff-remat lesson: recompute re-reads its inputs, so a byte
# win on paper can still measure slower through HBM).
_gru_gates_remat = jax.checkpoint(_gru_gates_impl, static_argnums=(3,))

# Trace-time default for the gate remat, set by gate_remat_default() below.
# Round-5 on-chip A/B (onchip_r5/ab_summary.log + bench_train_s2vt_gremat
# .log — two independent sessions, same signs): gate remat is +10-11% on
# the S2VT train step (memory-bound; the remat cuts 2.42 -> 0.87 GiB of
# scan saves) but -4..-11% on s2vt-att — so the S2VT train step runs under
# gate_remat_default(True) (train/step.py) and every other path keeps the
# opt-in. VCR_GRU_GATES_REMAT=0/1 overrides BOTH directions explicitly.
# The step is BITWISE identical either way (tests/test_gru_gates_remat.py).
_GATE_REMAT_DEFAULT = False


@contextlib.contextmanager
def gate_remat_default(enabled: bool):
    """Scope the gate-remat default for code traced inside (env overrides)."""
    global _GATE_REMAT_DEFAULT
    prev = _GATE_REMAT_DEFAULT
    _GATE_REMAT_DEFAULT = enabled
    try:
        yield
    finally:
        _GATE_REMAT_DEFAULT = prev


def gru_gates(x_gates: jax.Array, h: jax.Array, params,
              compute_dtype=jnp.bfloat16, h_gates=None):
    """One GRU step given precomputed input gates x_gates = x @ w_ih + b_ih.

    torch semantics: r = σ(xr + hr); z = σ(xz + hz); n = tanh(xn + r∘hn);
    h' = (1-z)∘n + z∘h.

    ``h_gates``: optionally precomputed h @ w_hh + b_hh — the W8 decode
    steppers (ops/wquant.gru_h_gates) pass the int8-weight form here so the
    gate math itself stays this one shared parity implementation.
    """
    if h_gates is not None:
        return _gru_gates_impl(x_gates, h, params, compute_dtype, h_gates)
    env = os.environ.get("VCR_GRU_GATES_REMAT")
    if (_GATE_REMAT_DEFAULT if env is None else env == "1"):
        return _gru_gates_remat(x_gates, h, params, compute_dtype)
    return _gru_gates_impl(x_gates, h, params, compute_dtype)


def gru_step(params, x: jax.Array, h: jax.Array, compute_dtype=jnp.bfloat16):
    """Single GRU step from raw input x (B, I): used inside decode scans where
    x depends on the previous step's output."""
    x_gates = vdot(x, params["w_ih"], compute_dtype) + params["b_ih"]
    return gru_gates(x_gates, h, params, compute_dtype)


def gru_sequence(
    params,
    xs: jax.Array,
    h0: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Run a GRU over xs (T, B, I) -> (outputs (T, B, H), h_last (B, H)).

    The input projection for all T steps is a single MXU matmul.
    """
    t, b, i = xs.shape
    hidden = params["w_hh"].shape[0]
    x_gates = (vdot(xs.reshape(t * b, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(t, b, 3 * hidden)
    if h0 is None:
        h0 = jnp.zeros((b, hidden), dtype=jnp.float32)

    def step(h, xg):
        h_next = gru_gates(xg, h, params, compute_dtype)
        return h_next, h_next

    h_last, outs = jax.lax.scan(step, h0, x_gates)
    return outs, h_last


# ---------------- LSTM ----------------

def lstm_init(key: jax.Array, input_size: int, hidden_size: int):
    """Single-layer LSTM params, gate order [i | f | g | o] as in torch."""
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": vinit.rnn_mat_init(k1, input_size, 4 * hidden_size),
        "w_hh": vinit.rnn_mat_init(k2, hidden_size, 4 * hidden_size),
        "b_ih": vinit.const_bias(4 * hidden_size),
        "b_hh": vinit.const_bias(4 * hidden_size),
    }


def _lstm_gates_impl(x_gates, hc, params, compute_dtype=jnp.bfloat16):
    h, c = hc
    h_gates = vdot(h, params["w_hh"], compute_dtype) + params["b_hh"]
    xi, xf, xg, xo = jnp.split(x_gates, 4, axis=-1)
    hi, hf, hg, ho = jnp.split(h_gates, 4, axis=-1)
    i = jax.nn.sigmoid(xi + hi)
    f = jax.nn.sigmoid(xf + hf)
    g = jnp.tanh(xg + hg)
    o = jax.nn.sigmoid(xo + ho)
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


_lstm_gates_remat = jax.checkpoint(_lstm_gates_impl, static_argnums=(3,))


def lstm_gates(x_gates, hc, params, compute_dtype=jnp.bfloat16):
    """One LSTM step; VCR_GRU_GATES_REMAT=1 remats the gate math exactly as
    gru_gates does (same save-stack accounting, same bitwise contract)."""
    if os.environ.get("VCR_GRU_GATES_REMAT") == "1":
        return _lstm_gates_remat(x_gates, hc, params, compute_dtype)
    return _lstm_gates_impl(x_gates, hc, params, compute_dtype)


def lstm_sequence(params, xs, hc0=None, reverse: bool = False, compute_dtype=jnp.bfloat16):
    """LSTM over xs (T, B, I) -> (outputs (T, B, H), (h_last, c_last))."""
    t, b, i = xs.shape
    hidden = params["w_hh"].shape[0]
    x_gates = (vdot(xs.reshape(t * b, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(t, b, 4 * hidden)
    if hc0 is None:
        zeros = jnp.zeros((b, hidden), dtype=jnp.float32)
        hc0 = (zeros, zeros)

    def step(hc, xg):
        hc_next = lstm_gates(xg, hc, params, compute_dtype)
        return hc_next, hc_next[0]

    hc_last, outs = jax.lax.scan(step, hc0, x_gates, reverse=reverse)
    return outs, hc_last


def bilstm_init(key: jax.Array, input_size: int, hidden_size: int):
    """Bidirectional LSTM (reference RationaleNet Generator, RationaleNet.py:26-27)."""
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_init(kf, input_size, hidden_size),
            "bwd": lstm_init(kb, input_size, hidden_size)}


def bilstm_sequence(params, xs, compute_dtype=jnp.bfloat16):
    """xs (T, B, I) -> outputs (T, B, 2H): [forward ; backward] concat, matching
    torch's bidirectional=True output layout."""
    outs_f, _ = lstm_sequence(params["fwd"], xs, compute_dtype=compute_dtype)
    outs_b, _ = lstm_sequence(params["bwd"], xs, reverse=True, compute_dtype=compute_dtype)
    return jnp.concatenate([outs_f, outs_b], axis=-1)
