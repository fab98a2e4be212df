"""DIA SpMM kernels.

``dia_spmm_t(dia, xt)`` is the Pallas TPU kernel in the *transposed*
multivector layout xt: (s, m) - rows live in the lane dimension, so a
skinny multivector (s = 1..32) still drives all 128 VPU lanes, and the
shifted diagonal accesses become lane-offset slices of a VMEM window that
is DMA'd once per row block and reused across all diagonals.  The naive
XLA lowering re-reads V from HBM once per diagonal and runs at s/128 lane
utilization; this kernel reads V once and runs full-lane.

``dia_spmm(dia, x)`` is the layout-compatible wrapper: on TPU float32 it
transposes in and out of the (s, m) layout (XLA fuses these into
copies); elsewhere it falls back to the jnp slice-add path.

This is the BASELINE.md north-star SpMM: per-chip speed-of-light on
structured (stencil) sparsity; under row sharding the window overlap is
exactly the halo a device needs from its neighbors.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rails_tpu.sparse.formats import DiaMatrix

__all__ = ["dia_spmm", "dia_spmm_t", "dia_spmm_pallas"]


def _round_up(x, mult):
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit,
                   static_argnames=("offsets", "block_rows", "pad_l"))
def _dia_spmm_t_impl(data, xt_pad, offsets: Tuple[int, ...],
                     block_rows: int, pad_l: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, m_pad = data.shape
    s = xt_pad.shape[0]
    r = block_rows
    win = xt_pad.shape[1] - m_pad + r      # window length per block
    num_blocks = m_pad // r

    def kernel(data_ref, xt_ref, out_ref, w_ref, sems):
        # double-buffered window: prefetch block i+1 while computing i
        i = pl.program_id(0)
        nb = pl.num_programs(0)

        def window_dma(slot, blk):
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(blk * r, win)], w_ref.at[slot],
                sems.at[slot])

        @pl.when(i == 0)
        def _():
            window_dma(0, 0).start()

        @pl.when(i + 1 < nb)
        def _():
            window_dma((i + 1) % 2, i + 1).start()

        window_dma(i % 2, i).wait()
        slot = i % 2
        acc = jnp.zeros((s, r), dtype=jnp.float32)
        for idx, off in enumerate(offsets):
            a0 = pad_l + off
            diag = data_ref[idx, :]
            acc = acc + diag[None, :] * w_ref[slot, :, a0:a0 + r]
        out_ref[:] = acc.astype(out_ref.dtype)

    flops = 2 * d * m_pad * s
    bytes_accessed = (d * m_pad + 2 * m_pad * s) * 4
    return pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((s, r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, m_pad), xt_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, s, win), xt_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(data, xt_pad)


def dia_spmm_t(dia: DiaMatrix, xt: jax.Array,
               block_rows: int = 2048) -> jax.Array:
    """y^T = (A @ x)^T with x given as xt: (s, m).  Pallas TPU kernel."""
    m, n = dia.shape
    offsets = dia.offsets
    span_lo = max(0, -min(offsets))
    span_hi = max(0, max(offsets))
    pad_l = _round_up(span_lo, 128)
    m_pad = _round_up(m, block_rows)
    # window = [i*r - pad_l, i*r + r + tail): total must keep the padded
    # array length aligned; tail covers span_hi plus the row padding
    tail = _round_up(span_hi + (m_pad - m), 128)
    data = dia.data
    if m_pad != m:
        data = jnp.pad(data, ((0, 0), (0, m_pad - m)))
    xt_pad = jnp.pad(xt, ((0, 0), (pad_l, tail + (m_pad - m))))
    # xt_pad length = pad_l + m + tail + (m_pad - m); per-block window
    # length = r + pad_l + tail (+ leftover) - computed inside impl
    out = _dia_spmm_t_impl(data, xt_pad, offsets, block_rows, pad_l)
    return out[:, :m]


def dia_spmm_pallas(dia: DiaMatrix, x: jax.Array,
                    block_rows: int = 2048) -> jax.Array:
    """(m, s) layout wrapper around the transposed kernel."""
    yt = dia_spmm_t(dia, x.T, block_rows=block_rows)
    return yt.T


def dia_spmm(dia: DiaMatrix, x: jax.Array) -> jax.Array:
    """Dispatching DIA SpMM: Pallas on TPU float32, jnp elsewhere."""
    if (jax.default_backend() == "tpu"
            and x.dtype == jnp.float32
            and x.ndim == 2
            and dia.shape[0] == dia.shape[1]
            and dia.shape[0] >= 4096):
        return dia_spmm_pallas(dia, x)
    return dia.matmat(x)
