"""DIA SpMM kernels.

``dia_spmm_t(dia, xt)`` is the Pallas TPU kernel in the *transposed*
multivector layout xt: (s, m) - rows live in the lane dimension, so a
skinny multivector (s = 1..32) still drives all 128 VPU lanes, and the
shifted diagonal accesses become lane-offset slices of a VMEM window that
is DMA'd once per row block and reused across all diagonals.  The naive
XLA lowering re-reads V from HBM once per diagonal and runs at s/128 lane
utilization; this kernel reads V once and runs full-lane.

Zero-copy edges: the kernel reads the *unpadded* xt directly (a padded
copy would add a full HBM read+write per apply - measured as the
dominant cost of the v1 kernel).  Interior row blocks DMA a
``[blk*R - pad_l, blk*R + R + tail)`` window from xt, which keeps every
diagonal slice start static and 128-aligned-friendly; the few blocks
whose window would poke outside [0, m) are computed by a cheap XLA
slice-add on a small strip and patched in afterwards.

``dia_spmm(dia, x)`` is the layout-compatible wrapper: on TPU float32 it
transposes in and out of the (s, m) layout (XLA fuses these into
copies); elsewhere it falls back to the jnp slice-add path.

This is the BASELINE.md north-star SpMM: per-chip speed-of-light on
structured (stencil) sparsity; under row sharding the window overlap is
exactly the halo a device needs from its neighbors (the reference's
Epetra_CrsMatrix::Apply halo exchange,
/root/reference/src/Epetra_OperatorWrapper.cpp:75-91).
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


def _edge_block_t(data, xt, offsets, r0, r1):
    """y^T[:, r0:r1] by clamped slice-adds (XLA, small strips)."""
    m = xt.shape[1]
    rb = r1 - r0
    acc = jnp.zeros((xt.shape[0], rb), dtype=xt.dtype)
    for idx, off in enumerate(offsets):
        # y[j] += data[idx, j] * x[j + off] for j in [r0, r1)
        lo = max(r0 + off, 0)
        hi = min(r1 + off, m)
        if lo >= hi:
            continue
        dst_lo = lo - off - r0
        dst_hi = hi - off - r0
        contrib = data[idx, dst_lo + r0:dst_hi + r0] * xt[:, lo:hi]
        acc = acc.at[:, dst_lo:dst_hi].add(contrib)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "block_rows", "pad_l", "tail", "patches"))
def _dia_spmm_t_impl(data, xt, offsets: Tuple[int, ...], block_rows: int,
                     pad_l: int, tail: int,
                     patches: Tuple[Tuple[int, int], ...]):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, m = data.shape
    s = xt.shape[0]
    r = block_rows
    win = r + pad_l + tail
    # Grid over FULL, in-bounds blocks only - no masked partial blocks.
    num_blocks = m // r
    patch_starts = {p0 for p0, _ in patches}

    def kernel(data_ref, xt_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        is_interior = jnp.full((), True)
        nxt_interior = (i + 1) < nb
        for b in sorted(patch_starts):
            if b % r:
                continue
            is_interior &= i != b // r
            nxt_interior &= (i + 1) != b // r

        def window_dma(slot, blk):
            # r and pad_l are multiples of 128, so the start is too
            start = pl.multiple_of(blk * r - pad_l, 128)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, win)], w_ref.at[slot],
                sems.at[slot])

        if 0 not in patch_starts:
            # block 0 is interior (pad_l == 0): start its own window.
            # (Guarded at trace time: with pad_l > 0 this branch would
            # bake the negative constant address -pad_l into the DMA,
            # which Mosaic rejects even under a false pl.when.)
            @pl.when(i == 0)
            def _():
                window_dma(0, 0).start()

        @pl.when(nxt_interior)
        def _():
            window_dma((i + 1) % 2, i + 1).start()

        @pl.when(is_interior)
        def _():
            slot = i % 2
            window_dma(slot, i).wait()
            acc = jnp.zeros((s, r), dtype=jnp.float32)
            for idx, off in enumerate(offsets):
                a0 = pad_l + off
                diag = data_ref[idx, :]
                acc = acc + diag[None, :] * w_ref[slot, :, a0:a0 + r]
            out_ref[:] = acc.astype(out_ref.dtype)

    flops = 2 * d * m * s
    bytes_accessed = (d * m + 2 * m * s) * jnp.dtype(xt.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        # Full (s, m) output; the grid visits only the full blocks
        # (every accessed block is in bounds - no masked partial blocks),
        # and the remainder strip is patched below.
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, s, win), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(data, xt)
    # Patch the edge strips (in-place dynamic updates inside jit).
    for r0, r1 in patches:
        out = jax.lax.dynamic_update_slice(
            out, _edge_block_t(data, xt, offsets, r0, r1), (0, r0))
    return out


def dia_spmm_t(dia: DiaMatrix, xt: jax.Array,
               block_rows: int = 16384) -> jax.Array:
    # (32768 measured within run-to-run noise of 16384 on v5e; 49152
    # exceeds the 16MB VMEM scoped limit at s=16)
    """y^T = (A @ x)^T with x given as xt: (s, m).  Pallas TPU kernel."""
    m, n = dia.shape
    offsets = dia.offsets
    s = xt.shape[0]
    d = len(offsets)
    span_lo = max(0, -min(offsets))
    span_hi = max(0, max(offsets))
    pad_l = _round_up(span_lo, 128)
    tail = _round_up(span_hi, 128)
    # shrink blocks so double-buffered window + out + data + the (s, r)
    # accumulator fit the 16MB VMEM scoped limit with headroom for
    # Mosaic temporaries (wide multivectors would otherwise OOM)
    itemsize = jnp.dtype(xt.dtype).itemsize
    budget = 10 * 1024 * 1024 - 2 * s * (pad_l + tail) * itemsize
    r_fit = budget // ((5 * s + 2 * d) * itemsize)
    block_rows = min(block_rows, max((r_fit // 128) * 128, 1024))
    r = min(block_rows, _round_up(m, 128))
    win = r + pad_l + tail
    num_blocks = m // r
    # strips handled by the XLA path: full blocks whose xt window
    # [b*r - pad_l, b*r + win) leaves [0, m), plus the remainder rows
    patches = [
        (b * r, (b + 1) * r) for b in range(num_blocks)
        if b * r - pad_l < 0 or b * r - pad_l + win > m]
    if num_blocks * r < m:
        patches.append((num_blocks * r, m))
    if sum(r1 - r0 for r0, r1 in patches) == m:
        return dia.matmat(xt.T).T  # too small for the kernel
    out = _dia_spmm_t_impl(dia.data, xt, offsets, r, pad_l, tail,
                           tuple(patches))
    return out


def dia_spmm_pallas(dia: DiaMatrix, x: jax.Array,
                    block_rows: int = 16384) -> jax.Array:
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
