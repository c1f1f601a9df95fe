"""Pallas TPU kernel: fused GRU sequence.

The scan-based GRU (vcr_tpu.nn.rnn.gru_sequence) already hoists the input
projection into one big MXU matmul; what remains per step is the small
recurrent matmul + gate math. This kernel runs the WHOLE recurrence in one
pallas_call: the TPU grid is sequential, so the hidden state lives in a VMEM
scratch buffer across grid steps, W_hh stays pinned in VMEM, and each step
streams one (B, 3H) x-gates tile in and one (B, H) output tile out. That
removes the per-step XLA while-loop overhead and all HBM round-trips for h.

Gate math matches torch exactly (r, z, n ordering) — same as rnn.gru_gates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_seq_kernel(xg_ref, whh_ref, bhh_ref, h0_ref, out_ref, h_scratch,
                    *, hidden: int, compute_dtype, time_major: bool):
    t = pl.program_id(1)  # grid = (batch_tiles, time); time iterates fastest

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h = h_scratch[:]  # (TB, H) float32
    h_gates = jnp.dot(h.astype(compute_dtype), whh_ref[:].astype(compute_dtype),
                      preferred_element_type=jnp.float32) + bhh_ref[:]
    # block is (1, TB, 3H) in time-major layout; in batch-major the gates are
    # viewed as (B, T*3H) and the block is a 2D (TB, 3H) column slice
    xg = (xg_ref[0] if time_major else xg_ref[:]).astype(jnp.float32)

    xr, xz, xn = (xg[:, :hidden], xg[:, hidden:2 * hidden], xg[:, 2 * hidden:])
    hr, hz, hn = (h_gates[:, :hidden], h_gates[:, hidden:2 * hidden],
                  h_gates[:, 2 * hidden:])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h

    h_scratch[:] = h_new
    if time_major:
        out_ref[0] = h_new
    else:
        out_ref[:] = h_new


def _resolved_interpret(interpret: bool) -> bool:
    """Pallas TPU kernels only compile on TPU; on any other backend (CPU
    tests, the 8-virtual-device mesh, dryruns) fall back to interpret mode so
    ``use_pallas=True`` configs run everywhere."""
    return interpret or jax.default_backend() != "tpu"


def _pick_batch_tile(b: int, hidden: int) -> int:
    """Largest batch tile (multiple of 8 lanes' sublane) keeping the per-step
    working set comfortably inside VMEM."""
    # per-step working set counted with Pallas's double buffering of streamed
    # blocks: 2x xg tile (bf16) + 2x out tile (f32) + 2x h0 (f32) + scratch
    budget = 11 * 1024 * 1024
    tile = b
    while tile > 8:
        per_step = 2 * tile * 3 * hidden * 2 + 5 * tile * hidden * 4
        if per_step <= budget and b % tile == 0:
            return tile
        tile //= 2
    # tiny batches: the tile must DIVIDE b or the grid silently drops rows
    # (nb = b // tile == 0 produced NaN garbage for b < 8 — caught by
    # test_use_pallas_trains_end_to_end); sublane padding is pallas's job
    while b % tile:
        tile -= 1
    return tile


def _run_gru_kernel(params, x_gates, h0, *, hidden, compute_dtype, time_major,
                    interpret):
    """Shared pallas_call for both layouts. x_gates: (T, B, 3H) time-major or
    (B, T, 3H) batch-major; outputs mirror the input layout."""
    if time_major:
        t, b, _ = x_gates.shape
        out_shape = (t, b, hidden)
    else:
        b, t, _ = x_gates.shape
        # 2D views satisfy the TPU lowering's last-two-dims tiling rule
        x_gates = x_gates.reshape(b, t * 3 * hidden)
        out_shape = (b, t * hidden)
    tile_b = _pick_batch_tile(b, hidden)
    nb = b // tile_b
    if time_major:
        xg_spec = pl.BlockSpec((1, tile_b, 3 * hidden),
                               lambda nb_, t_: (t_, nb_, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, tile_b, hidden),
                                lambda nb_, t_: (t_, nb_, 0),
                                memory_space=pltpu.VMEM)
    else:
        xg_spec = pl.BlockSpec((tile_b, 3 * hidden),
                               lambda nb_, t_: (nb_, t_),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tile_b, hidden),
                                lambda nb_, t_: (nb_, t_),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(_gru_seq_kernel, hidden=hidden,
                               compute_dtype=compute_dtype,
                               time_major=time_major)
    return pl.pallas_call(
        kernel,
        grid=(nb, t),
        in_specs=[
            xg_spec,                                          # x_gates, streamed
            pl.BlockSpec((hidden, 3 * hidden), lambda nb_, t_: (0, 0),
                         memory_space=pltpu.VMEM),            # W_hh, pinned
            pl.BlockSpec((3 * hidden,), lambda nb_, t_: (0,),
                         memory_space=pltpu.VMEM),            # b_hh
            pl.BlockSpec((tile_b, hidden), lambda nb_, t_: (nb_, 0),
                         memory_space=pltpu.VMEM),            # h0
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, hidden), jnp.float32)],
        interpret=_resolved_interpret(interpret),
    )(x_gates, params["w_hh"].astype(compute_dtype), params["b_hh"], h0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gru_pallas_ad(params, xs, h0, compute_dtype, interpret):
    """AD-wrapped core of gru_sequence_pallas. Backward pass = jax.vjp of the
    mathematically identical pure-JAX gru_sequence, recomputed from the saved
    inputs (remat-style: one extra forward of FLOPs, no pallas backward kernel
    needed, exact gradients of the same function). This makes
    ``use_pallas=True`` legal under jax.grad — previously it crashed."""
    from vcr_tpu.nn.layers import vdot

    t, b, i = xs.shape
    hidden = params["w_hh"].shape[0]
    xg_dtype = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
    x_gates = (vdot(xs.reshape(t * b, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(t, b, 3 * hidden).astype(xg_dtype)
    outs = _run_gru_kernel(params, x_gates, h0, hidden=hidden,
                           compute_dtype=compute_dtype, time_major=True,
                           interpret=interpret)
    return outs, outs[-1]


def _gru_pallas_fwd(params, xs, h0, compute_dtype, interpret):
    out = _gru_pallas_ad(params, xs, h0, compute_dtype, interpret)
    return out, (params, xs, h0)


def _gru_pallas_bwd(compute_dtype, interpret, res, cotangents):
    from vcr_tpu.nn.rnn import gru_sequence

    params, xs, h0 = res
    _, vjp = jax.vjp(
        lambda p, x, h: gru_sequence(p, x, h0=h, compute_dtype=compute_dtype),
        params, xs, h0)
    return vjp(cotangents)


_gru_pallas_ad.defvjp(_gru_pallas_fwd, _gru_pallas_bwd)


def gru_sequence_pallas(params, xs: jax.Array, h0=None,
                        compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Drop-in replacement for rnn.gru_sequence: xs (T, B, I) ->
    (outputs (T, B, H), h_last (B, H)). Batch-tiled grid: each tile runs its
    full time recurrence with h resident in VMEM; x-gates stream in bf16.
    Differentiable: backward runs the pure-JAX recurrence (see _gru_pallas_ad)."""
    if h0 is None:
        h0 = jnp.zeros((xs.shape[1], params["w_hh"].shape[0]), dtype=jnp.float32)
    return _gru_pallas_ad(params, xs, h0, compute_dtype, interpret)


def _gru_seq_dma_kernel(xg_hbm, whh_ref, bhh_ref, h0_ref, out_hbm,
                        h_scratch, xg_buf, out_buf, in_sems, out_sems,
                        *, hidden: int, t_steps: int, compute_dtype):
    """One grid step per batch tile; the whole time recurrence runs inside with
    manually double-buffered DMA: xg tiles stream HBM->VMEM ahead of compute,
    outputs stream VMEM->HBM behind it (pallas guide: double buffering)."""

    # ANY-space refs cover the whole array; slice the batch tile in the DMA
    tile_b = xg_buf.shape[1]
    tile0 = pl.program_id(0) * tile_b

    def in_dma(slot, t):
        return pltpu.make_async_copy(xg_hbm.at[t, pl.ds(tile0, tile_b)],
                                     xg_buf.at[slot], in_sems.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(out_buf.at[slot],
                                     out_hbm.at[t, pl.ds(tile0, tile_b)],
                                     out_sems.at[slot])

    h_scratch[:] = h0_ref[:]
    in_dma(0, 0).start()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < t_steps)
        def _():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()

        h = h_scratch[:]
        h_gates = jnp.dot(h.astype(compute_dtype),
                          whh_ref[:].astype(compute_dtype),
                          preferred_element_type=jnp.float32) + bhh_ref[:]
        xg = xg_buf[slot].astype(jnp.float32)
        xr, xz, xn = (xg[:, :hidden], xg[:, hidden:2 * hidden],
                      xg[:, 2 * hidden:])
        hr, hz, hn = (h_gates[:, :hidden], h_gates[:, hidden:2 * hidden],
                      h_gates[:, 2 * hidden:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_scratch[:] = h_new

        # wait for the write started 2 steps ago before reusing its buffer
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        out_buf[slot] = h_new
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, t_steps, body, 0)
    # drain the last two in-flight writes
    @pl.when(t_steps >= 2)
    def _():
        out_dma((t_steps - 2) % 2, t_steps - 2).wait()
    out_dma((t_steps - 1) % 2, t_steps - 1).wait()


def gru_sequence_pallas_dma(params, xs: jax.Array, h0=None,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False):
    """Manual-DMA variant of gru_sequence_pallas (same (T,B,I) API).

    Measured SLOWER than the grid-pipelined kernel on TPU v5e (9.8 vs 8.9 ms at
    T=30/B=2048/H=512): Pallas's automatic block pipelining already achieves
    full DMA/compute overlap, so the remaining recurrence cost is the dependent
    small-matmul latency, not transfer scheduling. Kept as a bitwise-verified
    reference implementation of the manual double-buffering pattern."""
    from vcr_tpu.nn.layers import vdot

    t, b, i = xs.shape
    hidden = params["w_hh"].shape[0]
    xg_dtype = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
    x_gates = (vdot(xs.reshape(t * b, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(t, b, 3 * hidden).astype(xg_dtype)
    if h0 is None:
        h0 = jnp.zeros((b, hidden), dtype=jnp.float32)

    tile_b = _pick_batch_tile(b, hidden)
    nb = b // tile_b
    kernel = functools.partial(_gru_seq_dma_kernel, hidden=hidden, t_steps=t,
                               compute_dtype=compute_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            # stays whole in HBM; the kernel DMAs per-tile slices itself
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((hidden, 3 * hidden), lambda nb_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * hidden,), lambda nb_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda nb_: (nb_, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, hidden), jnp.float32),        # h
            pltpu.VMEM((2, tile_b, 3 * hidden), xg_dtype),    # xg double buffer
            pltpu.VMEM((2, tile_b, hidden), jnp.float32),     # out double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_resolved_interpret(interpret),
    )(x_gates, params["w_hh"].astype(compute_dtype), params["b_hh"], h0)
    return outs, outs[-1]


def gru_sequence_pallas_bt(params, xs_bt: jax.Array, h0=None,
                           compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Batch-major variant: xs (B, T, I) -> (outputs (B, T, H), h_last (B, H)).
    The kernel's block index map reads the natural layout directly, so neither
    the inputs nor the gate tensor is ever transposed — at B=2048/V=4096 this
    removes ~1 GB of pure layout traffic per encoder call."""
    from vcr_tpu.nn.layers import vdot

    b, t, i = xs_bt.shape
    hidden = params["w_hh"].shape[0]
    xg_dtype = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
    x_gates = (vdot(xs_bt.reshape(b * t, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(b, t, 3 * hidden).astype(xg_dtype)
    if h0 is None:
        h0 = jnp.zeros((b, hidden), dtype=jnp.float32)
    outs = _run_gru_kernel(params, x_gates, h0, hidden=hidden,
                           compute_dtype=compute_dtype, time_major=False,
                           interpret=interpret).reshape(b, t, hidden)
    return outs, outs[:, -1]


# ---------------- LSTM / BiLSTM (RationaleNet generator) ----------------

def _lstm_seq_kernel(xg_ref, whh_ref, bhh_ref, h0_ref, c0_ref, out_ref,
                     clast_ref, h_scratch, c_scratch,
                     *, hidden: int, compute_dtype):
    """Fused LSTM sequence, same VMEM-resident design as the GRU kernel but
    carrying (h, c). Gate order [i | f | g | o] matches torch / rnn.lstm_gates.
    Time reversal is done in the BLOCK INDEX MAPS (see lstm_sequence_pallas) —
    the kernel itself is direction-agnostic. c_last is written every step into
    a single overwritten block; the final (sequentially last) grid step leaves
    the correct value."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]
        c_scratch[:] = c0_ref[:]

    h = h_scratch[:]
    c = c_scratch[:]
    h_gates = jnp.dot(h.astype(compute_dtype), whh_ref[:].astype(compute_dtype),
                      preferred_element_type=jnp.float32) + bhh_ref[:]
    xg = xg_ref[0].astype(jnp.float32)

    xi, xf, xg_, xo = (xg[:, :hidden], xg[:, hidden:2 * hidden],
                       xg[:, 2 * hidden:3 * hidden], xg[:, 3 * hidden:])
    hi, hf, hg, ho = (h_gates[:, :hidden], h_gates[:, hidden:2 * hidden],
                      h_gates[:, 2 * hidden:3 * hidden], h_gates[:, 3 * hidden:])
    i = jax.nn.sigmoid(xi + hi)
    f = jax.nn.sigmoid(xf + hf)
    g = jnp.tanh(xg_ + hg)
    o = jax.nn.sigmoid(xo + ho)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    h_scratch[:] = h_new
    c_scratch[:] = c_new
    out_ref[0] = h_new
    clast_ref[:] = c_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _lstm_pallas_ad(params, xs, hc0, reverse, compute_dtype, interpret):
    from vcr_tpu.nn.layers import vdot

    t, b, i = xs.shape
    hidden = params["w_hh"].shape[0]
    xg_dtype = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
    x_gates = (vdot(xs.reshape(t * b, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(t, b, 4 * hidden).astype(xg_dtype)
    h0, c0 = hc0

    tile_b = _pick_batch_tile(b, hidden)
    nb = b // tile_b
    # reversed scan = identical kernel, time index maps walk the sequence
    # backwards (grid dim 1 is sequential, so scratch state threads correctly)
    tmap = (lambda nb_, t_: (t - 1 - t_, nb_, 0)) if reverse \
        else (lambda nb_, t_: (t_, nb_, 0))

    kernel = functools.partial(_lstm_seq_kernel, hidden=hidden,
                               compute_dtype=compute_dtype)
    outs, c_last = pl.pallas_call(
        kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, tile_b, 4 * hidden), tmap,
                         memory_space=pltpu.VMEM),             # x_gates
            pl.BlockSpec((hidden, 4 * hidden), lambda nb_, t_: (0, 0),
                         memory_space=pltpu.VMEM),             # W_hh pinned
            pl.BlockSpec((4 * hidden,), lambda nb_, t_: (0,),
                         memory_space=pltpu.VMEM),             # b_hh
            pl.BlockSpec((tile_b, hidden), lambda nb_, t_: (nb_, 0),
                         memory_space=pltpu.VMEM),             # h0
            pl.BlockSpec((tile_b, hidden), lambda nb_, t_: (nb_, 0),
                         memory_space=pltpu.VMEM),             # c0
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, hidden), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hidden), lambda nb_, t_: (nb_, 0),
                         memory_space=pltpu.VMEM),             # c_last
        ],
        out_shape=[jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((b, hidden), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tile_b, hidden), jnp.float32),
                        pltpu.VMEM((tile_b, hidden), jnp.float32)],
        interpret=_resolved_interpret(interpret),
    )(x_gates, params["w_hh"].astype(compute_dtype), params["b_hh"], h0, c0)
    h_last = outs[0] if reverse else outs[-1]
    return outs, (h_last, c_last)


def _lstm_pallas_fwd(params, xs, hc0, reverse, compute_dtype, interpret):
    out = _lstm_pallas_ad(params, xs, hc0, reverse, compute_dtype, interpret)
    return out, (params, xs, hc0)


def _lstm_pallas_bwd(reverse, compute_dtype, interpret, res, cotangents):
    from vcr_tpu.nn.rnn import lstm_sequence

    params, xs, hc0 = res
    _, vjp = jax.vjp(
        lambda p, x, hc: lstm_sequence(p, x, hc0=hc, reverse=reverse,
                                       compute_dtype=compute_dtype),
        params, xs, hc0)
    return vjp(cotangents)


_lstm_pallas_ad.defvjp(_lstm_pallas_fwd, _lstm_pallas_bwd)


def lstm_sequence_pallas(params, xs: jax.Array, hc0=None, reverse: bool = False,
                         compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Drop-in replacement for rnn.lstm_sequence: xs (T, B, I) ->
    (outputs (T, B, H), (h_last, c_last)). Differentiable via the pure-JAX
    backward (same scheme as gru_sequence_pallas)."""
    if hc0 is None:
        zeros = jnp.zeros((xs.shape[1], params["w_hh"].shape[0]), jnp.float32)
        hc0 = (zeros, zeros)
    return _lstm_pallas_ad(params, xs, hc0, reverse, compute_dtype, interpret)


def bilstm_sequence_pallas(params, xs: jax.Array,
                           compute_dtype=jnp.bfloat16,
                           interpret: bool = False) -> jax.Array:
    """Drop-in replacement for rnn.bilstm_sequence: xs (T, B, I) ->
    (T, B, 2H), [forward ; backward] concat (torch bidirectional layout).
    Used by the RationaleNet generator when spec.use_pallas is set."""
    outs_f, _ = lstm_sequence_pallas(params["fwd"], xs,
                                     compute_dtype=compute_dtype,
                                     interpret=interpret)
    outs_b, _ = lstm_sequence_pallas(params["bwd"], xs, reverse=True,
                                     compute_dtype=compute_dtype,
                                     interpret=interpret)
    return jnp.concatenate([outs_f, outs_b], axis=-1)
