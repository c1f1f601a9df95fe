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
    return max(tile, 8)


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
        interpret=interpret,
    )(x_gates, params["w_hh"].astype(compute_dtype), params["b_hh"], h0)


def gru_sequence_pallas(params, xs: jax.Array, h0=None,
                        compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Drop-in replacement for rnn.gru_sequence: xs (T, B, I) ->
    (outputs (T, B, H), h_last (B, H)). Batch-tiled grid: each tile runs its
    full time recurrence with h resident in VMEM; x-gates stream in bf16."""
    from vcr_tpu.nn.layers import vdot

    t, b, i = xs.shape
    hidden = params["w_hh"].shape[0]
    xg_dtype = jnp.float32 if compute_dtype == jnp.float32 else jnp.bfloat16
    x_gates = (vdot(xs.reshape(t * b, i), params["w_ih"], compute_dtype)
               + params["b_ih"]).reshape(t, b, 3 * hidden).astype(xg_dtype)
    if h0 is None:
        h0 = jnp.zeros((b, hidden), dtype=jnp.float32)
    outs = _run_gru_kernel(params, x_gates, h0, hidden=hidden,
                           compute_dtype=compute_dtype, time_major=True,
                           interpret=interpret)
    return outs, outs[-1]


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
        interpret=interpret,
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
