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
``[blk*R - pad_l, blk*R + R + tail)`` window from xt; the first and last
full blocks DMA the in-range part of their window and mask the missing
edge lanes at compute time (static masks) - no XLA patch passes.  Only
the ``m % R`` remainder rows fall back to a small XLA slice-add strip.

``dia_spmm(dia, x)`` is the layout-compatible wrapper: on TPU float32 it
transposes in and out of the (s, m) layout.  Round-3 measurement
(BENCH_r03_tpu_prerun.json spmm_wrapper_overhead): the two XLA
transposes cost 1.35x at the bench geometry - consistent with 4 extra
HBM passes of x/y traffic now that the kernel itself sits at 0.95 of
the stream ceiling.  A native-(m, s)-layout variant was probed and
rejected (probe_kernel_nt.py: Mosaic pads 16-lane VMEM buffers 8x, and
the lane->sublane reshape that would avoid it does not compile); since
Gram GEMMs dominate solve iterations the wrapper costs ~4% end to end,
and the overhead is recorded in the bench artifact instead.

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
    static_argnames=("offsets", "block_rows", "pad_l", "tail", "rem"))
def _dia_spmm_t_impl(data, xt, offsets: Tuple[int, ...], block_rows: int,
                     pad_l: int, tail: int, rem: int):
    """Pallas kernel over all FULL blocks; the first/last blocks' missing
    window lanes are masked in-kernel (static masks), and only the
    ``rem = m % r`` remainder rows are patched by the XLA path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, m = data.shape
    s = xt.shape[0]
    r = block_rows
    win = r + pad_l + tail
    nb = m // r
    # edge-block typing (static): block 0 is special when pad_l > 0; the
    # last full block is special when its window would poke past m
    first_special = pad_l > 0
    last_special = (nb * r + tail) > m

    def kernel(data_ref, xt_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def dma_first(slot):
            # window rows [-pad_l, 0) don't exist: fill w[:, pad_l:] and
            # mask the missing prefix at compute time
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(0, r + tail)],
                w_ref.at[slot, :, pl.ds(pad_l, r + tail)], sems.at[slot])

        def dma_interior(slot, blk):
            # r and pad_l are multiples of 128, so the start is too
            start = pl.multiple_of(blk * r - pad_l, 128)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, win)], w_ref.at[slot],
                sems.at[slot])

        def dma_last(slot):
            # copy up to m, mask the missing suffix at compute time
            have = pad_l + r + rem       # rows [(nb-1)*r - pad_l, m)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds((nb - 1) * r - pad_l, have)],
                w_ref.at[slot, :, pl.ds(0, have)], sems.at[slot])

        def start_dma(blk):
            slot = blk % 2
            lo_ok = (blk > 0) if first_special else (blk >= 0)
            hi_ok = (blk < nb - 1) if last_special else (blk < nb)
            if first_special:
                @pl.when(blk == 0)
                def _():
                    dma_first(slot).start()
            if last_special:
                @pl.when(blk == nb - 1)
                def _():
                    dma_last(slot).start()

            @pl.when(lo_ok & hi_ok)
            def _():
                dma_interior(slot, blk).start()

        def wait_dma(blk):
            # the wait must name the same-shape copy (DMA semaphores
            # count bytes), so mirror start_dma's type dispatch
            slot = blk % 2
            lo_ok = (blk > 0) if first_special else (blk >= 0)
            hi_ok = (blk < nb - 1) if last_special else (blk < nb)
            if first_special:
                @pl.when(blk == 0)
                def _():
                    dma_first(slot).wait()
            if last_special:
                @pl.when(blk == nb - 1)
                def _():
                    dma_last(slot).wait()

            @pl.when(lo_ok & hi_ok)
            def _():
                dma_interior(slot, blk).wait()

        @pl.when(i == 0)
        def _():
            start_dma(0)

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + 1)

        wait_dma(i)
        slot = i % 2

        def acc_for(mask_kind):
            acc = jnp.zeros((s, r), dtype=jnp.float32)
            lane = None
            if mask_kind is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
            for idx, off in enumerate(offsets):
                a0 = pad_l + off
                diag = data_ref[idx, :]
                contrib = diag[None, :] * w_ref[slot, :, a0:a0 + r]
                if mask_kind == "first" and off < 0:
                    # rows j < -off would read x[j + off] < 0
                    contrib = jnp.where(lane >= -off, contrib, 0.0)
                elif mask_kind == "last" and off > rem:
                    # rows with (nb-1)*r + j + off >= m
                    contrib = jnp.where(lane < r + rem - off, contrib, 0.0)
                acc = acc + contrib
            return acc

        interior = jnp.full((), True)
        if first_special:
            interior &= i != 0

            @pl.when(i == 0)
            def _():
                out_ref[:] = acc_for("first").astype(out_ref.dtype)
        if last_special:
            interior &= i != nb - 1

            @pl.when((i == nb - 1) & (i != 0 if first_special else True))
            def _():
                out_ref[:] = acc_for("last").astype(out_ref.dtype)

        @pl.when(interior)
        def _():
            out_ref[:] = acc_for(None).astype(out_ref.dtype)

    flops = 2 * d * m * s
    bytes_accessed = (d * m + 2 * m * s) * jnp.dtype(xt.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, s, win), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(data, xt)
    # Patch the remainder strip (in-place dynamic update inside jit).
    if rem:
        out = jax.lax.dynamic_update_slice(
            out, _edge_block_t(data, xt, offsets, nb * r, m), (0, nb * r))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "block_rows", "rem"))
def _dia_spmm_t_impl_v3(data, xt, offsets: Tuple[int, ...],
                        block_rows: int, rem: int):
    """v3: disjoint-slab schedule - x is DMA'd exactly once (v2 re-reads
    the pad_l+tail halo of every window, ~12% extra bytes at the bench
    geometry).  4 resident (s, r) slabs; block i computes from slabs
    (i-1, i, i+1) with funnel slices across slab boundaries; the (m % r)
    remainder strip rides a 5th partial DMA and static masks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, m = data.shape
    s = xt.shape[0]
    r = block_rows
    nb = m // r
    span_lo = max(0, -min(offsets))
    span_hi = max(0, max(offsets))

    def kernel(data_ref, xt_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def dma_full(slot, blk):
            start = pl.multiple_of(blk * r, 128)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, r)], w_ref.at[slot],
                sems.at[slot])

        def dma_rem(slot):
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(nb * r, rem)],
                w_ref.at[slot, :, pl.ds(0, rem)], sems.at[slot])

        def start_dma(blk):
            slot = blk % 4
            @pl.when(blk < nb)
            def _():
                dma_full(slot, blk).start()
            if rem:
                @pl.when(blk == nb)
                def _():
                    dma_rem(slot).start()

        def wait_dma(blk):
            slot = blk % 4
            @pl.when(blk < nb)
            def _():
                dma_full(slot, blk).wait()
            if rem:
                @pl.when(blk == nb)
                def _():
                    dma_rem(slot).wait()

        @pl.when(i == 0)
        def _():
            start_dma(0)
            start_dma(1)

        # keep blocks (i-1, i, i+1) resident; prefetch i+2
        last_needed = nb if rem else nb - 1
        @pl.when(i + 2 <= last_needed)
        def _():
            start_dma(i + 2)

        # wait for block i+1 (started at step i-1; at i==0 both 0 and 1
        # were started above).  Block i itself was awaited at step i-1's
        # i+1-wait, except block 0, handled here.
        @pl.when(i == 0)
        def _():
            wait_dma(0)

        @pl.when(i + 1 <= last_needed)
        def _():
            wait_dma(i + 1)

        sa, sb, sc = (i - 1) % 4, i % 4, (i + 1) % 4
        first = i == 0
        last = i == nb - 1
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
        acc = jnp.zeros((s, r), dtype=jnp.float32)
        for idx, off in enumerate(offsets):
            diag = data_ref[idx, :]
            if off == 0:
                contrib = diag[None, :] * w_ref[sb]
            elif off > 0:
                shifted = jnp.concatenate(
                    [w_ref[sb, :, off:], w_ref[sc, :, :off]], axis=1)
                contrib = diag[None, :] * shifted
                # last block: lanes j with i*r + j + off >= m are invalid
                if off > rem:
                    contrib = jnp.where(
                        last, jnp.where(lane < r + rem - off, contrib, 0.0),
                        contrib)
            else:
                shifted = jnp.concatenate(
                    [w_ref[sa, :, r + off:], w_ref[sb, :, :r + off]], axis=1)
                contrib = diag[None, :] * shifted
                # first block: lanes j < -off would read x[j + off] < 0
                contrib = jnp.where(
                    first, jnp.where(lane >= -off, contrib, 0.0), contrib)
            acc = acc + contrib
        out_ref[:] = acc.astype(out_ref.dtype)

    flops = 2 * d * m * s
    bytes_accessed = (d * m + 2 * m * s) * jnp.dtype(xt.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, s, r), xt.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(data, xt)
    if rem:
        out = jax.lax.dynamic_update_slice(
            out, _edge_block_t(data, xt, offsets, nb * r, m), (0, nb * r))
    return out


def dia_spmm_t(dia: DiaMatrix, xt: jax.Array,
               block_rows: int = 32768, impl: str = "v2") -> jax.Array:
    """y^T = (A @ x)^T with x given as xt: (s, m).  Pallas TPU kernel.

    impl='v2' (default): overlapping-window schedule (re-reads the
    stencil halo, ~12% extra x bytes at the bench geometry).
    impl='v3': disjoint-slab schedule, x read exactly once - measured
    on v5e at the SAME throughput as v2 (the kernel is at the chip's
    effective stream ceiling, not DMA-byte-limited), and its remainder
    DMA requires 128-aligned m, so v2 stays the default.
    """
    m, n = dia.shape
    offsets = dia.offsets
    s = xt.shape[0]
    # Mosaic DMAs slice the sublane dimension at full width: it must be
    # a tile (8) multiple or compilation fails ("Slice shape along
    # dimension 0 must be aligned to tiling (8)").  Pad and strip - the
    # solver's expand-sized multivectors (s=6 by default) hit this at
    # every m large enough for the kernel (found by the round-4 n=65536
    # scale probe; the n<=4096 tests fall back to XLA below 2 blocks).
    s_pad = -(-s // 8) * 8
    if s_pad != s:
        out = dia_spmm_t(dia, jnp.pad(xt, ((0, s_pad - s), (0, 0))),
                         block_rows=block_rows, impl=impl)
        return out[:s]
    d = len(offsets)
    span_lo = max(0, -min(offsets))
    span_hi = max(0, max(offsets))
    itemsize = jnp.dtype(xt.dtype).itemsize
    if impl == "v3":
        # VMEM: 4 slabs + 2 out + 2 data + accumulator = (7s + 2d) * r
        r_fit = (11 * 1024 * 1024) // ((7 * s + 2 * d) * itemsize)
        r = min(block_rows, max((r_fit // 128) * 128, 1024),
                _round_up(m, 128))
        nb = m // r
        rem = m - nb * r
        if nb >= 2 and span_lo < r and span_hi < r:
            return _dia_spmm_t_impl_v3(dia.data, xt, offsets, r, rem)
        # geometry unsupported (e.g. stencil reaches past the remainder
        # slab) -> fall through to v2
    pad_l = _round_up(span_lo, 128)
    tail = _round_up(span_hi, 128)
    # shrink blocks so double-buffered window + out + data + the (s, r)
    # accumulator fit the 16MB VMEM scoped limit with headroom for
    # Mosaic temporaries (wide multivectors would otherwise OOM)
    budget = 11 * 1024 * 1024 - 2 * s * (pad_l + tail) * itemsize
    r_fit = budget // ((5 * s + 2 * d) * itemsize)
    block_rows = min(block_rows, max((r_fit // 128) * 128, 1024))
    r = min(block_rows, _round_up(m, 128))
    nb = m // r
    rem = m - nb * r
    # kernel needs >= 2 full blocks and a block wider than the stencil
    if nb < 2 or pad_l >= r or tail >= r:
        return dia.matmat(xt.T).T  # too small for the kernel
    return _dia_spmm_t_impl(dia.data, xt, offsets, r, pad_l, tail, rem)


@functools.partial(
    jax.jit, static_argnames=("offsets", "block_rows", "pad_l", "tail"))
def _dia_spmm_t_halo_impl(data, xt, hl, hh, offsets: Tuple[int, ...],
                          block_rows: int, pad_l: int, tail: int):
    """v2 schedule with *halo inputs* instead of edge masks: the first
    block's window prefix comes from ``hl`` (s, pad_l) = rows
    [-pad_l, 0) of the global vector, the last block's suffix from
    ``hh`` (s, tail) = rows [m, m+tail).  This is the distributed
    shard-local kernel: the XLA boundary-patch passes the previous halo
    path paid (measured 1.72x of the plain kernel at nd=1,
    BENCH_r03_tpu_prerun.json mesh note) collapse into two extra tiny
    DMAs on the edge blocks.  Requires m % block_rows == 0 and >= 2
    blocks; the caller guarantees both (parallel/halo_spmm.py picks a
    block size dividing the shard).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, m = data.shape
    s = xt.shape[0]
    r = block_rows
    win = r + pad_l + tail
    nb = m // r

    def kernel(data_ref, xt_ref, hl_ref, hh_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def main_first(slot):
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(0, r + tail)],
                w_ref.at[slot, :, pl.ds(pad_l, r + tail)],
                sems.at[slot, 0])

        def halo_lo(slot):
            return pltpu.make_async_copy(
                hl_ref, w_ref.at[slot, :, pl.ds(0, pad_l)],
                sems.at[slot, 1])

        def main_interior(slot, blk):
            start = pl.multiple_of(blk * r - pad_l, 128)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, win)], w_ref.at[slot],
                sems.at[slot, 0])

        def main_last(slot):
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds((nb - 1) * r - pad_l, pad_l + r)],
                w_ref.at[slot, :, pl.ds(0, pad_l + r)], sems.at[slot, 0])

        def halo_hi(slot):
            return pltpu.make_async_copy(
                hh_ref, w_ref.at[slot, :, pl.ds(pad_l + r, tail)],
                sems.at[slot, 1])

        def on_dma(blk, go):
            slot = blk % 2

            @pl.when(blk == 0)
            def _():
                go(main_first(slot))
                go(halo_lo(slot))

            @pl.when(blk == nb - 1)
            def _():
                go(main_last(slot))
                go(halo_hi(slot))

            @pl.when((blk > 0) & (blk < nb - 1))
            def _():
                go(main_interior(slot, blk))

        @pl.when(i == 0)
        def _():
            on_dma(0, lambda c: c.start())

        @pl.when(i + 1 < nb)
        def _():
            on_dma(i + 1, lambda c: c.start())

        on_dma(i, lambda c: c.wait())
        slot = i % 2

        acc = jnp.zeros((s, r), dtype=jnp.float32)
        for idx, off in enumerate(offsets):
            a0 = pad_l + off
            acc = acc + data_ref[idx, :][None, :] \
                * w_ref[slot, :, a0:a0 + r]
        out_ref[:] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, s, win), xt.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d * m * s,
            bytes_accessed=(d * m + 2 * m * s)
            * jnp.dtype(xt.dtype).itemsize,
            transcendentals=0),
    )(data, xt, hl, hh)


def halo_block_rows(m: int, s: int, d: int, pad_l: int, tail: int,
                    itemsize: int = 4, block_rows: int = 32768):
    """Largest VMEM-fitting 128-multiple block size that divides ``m``
    (the halo kernel has no remainder path), or None."""
    if m % 128:
        return None
    budget = 11 * 1024 * 1024 - 2 * s * (pad_l + tail) * itemsize
    r_fit = budget // ((5 * s + 2 * d) * itemsize)
    cap = min(block_rows, max((r_fit // 128) * 128, 128)) // 128
    units = m // 128
    span = max(pad_l, tail)
    for k in range(cap, 0, -1):
        r = k * 128
        if r <= span:
            break  # smaller r only gets worse
        if units % k == 0 and m // r >= 2:
            return r
    return None


def dia_spmm_t_halo(dia: DiaMatrix, xt: jax.Array, hl: jax.Array,
                    hh: jax.Array) -> jax.Array:
    """Shard-local y^T = (A @ x)^T with explicit halo inputs.

    ``hl`` (s, pad_l) holds global rows [-pad_l, 0) (zeros beyond the
    true boundary), ``hh`` (s, tail) rows [m, m+tail); pad_l/tail are
    the 128-rounded stencil spans.  Falls back to the masked kernel +
    XLA edge patches via the caller when the geometry doesn't fit.
    """
    m, _ = dia.shape
    offsets = dia.offsets
    s = xt.shape[0]
    s_pad = -(-s // 8) * 8
    if s_pad != s:
        # sublane tiling: see dia_spmm_t
        pad = ((0, s_pad - s), (0, 0))
        return dia_spmm_t_halo(dia, jnp.pad(xt, pad), jnp.pad(hl, pad),
                               jnp.pad(hh, pad))[:s]
    span_lo = max(0, -min(offsets))
    span_hi = max(0, max(offsets))
    pad_l = _round_up(span_lo, 128)
    tail = _round_up(span_hi, 128)
    if pad_l == 0 or tail == 0:
        raise ValueError("one-sided stencil: use the masked kernel")
    if hl.shape != (s, pad_l) or hh.shape != (s, tail):
        raise ValueError(
            f"halo shapes {hl.shape}/{hh.shape} != (s, {pad_l})/(s, {tail})")
    r = halo_block_rows(m, s, len(offsets), pad_l, tail,
                        jnp.dtype(xt.dtype).itemsize)
    if r is None:
        raise ValueError("no VMEM-fitting block size divides the shard")
    return _dia_spmm_t_halo_impl(dia.data, xt, hl, hh, offsets, r, pad_l,
                                 tail)


def dia_spmm_pallas(dia: DiaMatrix, x: jax.Array,
                    block_rows: int = 32768) -> jax.Array:
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
