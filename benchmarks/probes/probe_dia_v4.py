"""Probe: DIA kernel v4 - windowed schedule with VMEM-local overlap copy.

v2 re-reads the (pad_l + tail) stencil halo of every window from HBM
(~12% extra x bytes at the bench geometry); v3 reads x exactly once but
pays register funnel-shifts that eat the saving.  v4 keeps v2's
static-slice compute layout and instead assembles each interior window
from (a) a VMEM->VMEM copy of the overlap out of the previous window
buffer and (b) an HBM DMA of only the r new lanes.  HBM x traffic drops
to exactly-once while the compute body stays byte-for-byte v2.

Expected if local copies are free: 0.576 ms -> ~0.52 ms (678 GB/s
actual-byte rate held, 12% fewer bytes).

MEASURED CONCLUSION (round 3, v5e): v2 19.72 Gnnz/s, v4 20.14 Gnnz/s
(err 0.0) - 1.02x, not the 1.12x the byte count promises.  Same verdict
as the v3 exactly-once schedule (spmm.py docstring): the kernel is not
HBM-byte-limited at this geometry; the residual cost is DMA
issue/latency, which the overlap copy does not remove.  v2 stays the
shipped kernel; v4 is recorded here as evidence that the remaining
~10% vs the stream ceiling is not reachable by re-read elimination.
"""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import _round_up, dia_spmm_t


@functools.partial(
    jax.jit, static_argnames=("offsets", "block_rows", "pad_l", "tail"))
def dia_spmm_t_v4(data, xt, offsets, block_rows: int, pad_l: int,
                  tail: int):
    """Requires m % r == 0, nb >= 3.  First block: masked edge (v2).
    Interior block i: window = [overlap copied from window i-1 | r new
    lanes from HBM].  Last block: masked edge with partial HBM DMA."""
    d, m = data.shape
    s = xt.shape[0]
    r = block_rows
    win = r + pad_l + tail
    ov = pad_l + tail
    nb = m // r

    def kernel(data_ref, xt_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def dma_first(slot):
            # whole first window from HBM (rows [0, r + tail))
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(0, r + tail)],
                w_ref.at[slot, :, pl.ds(pad_l, r + tail)], sems.at[slot, 0])

        def dma_new(slot, blk):
            # r new rows [blk*r + tail, (blk+1)*r + tail)
            start = pl.multiple_of(blk * r + tail, 128)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, r)],
                w_ref.at[slot, :, pl.ds(ov, r)], sems.at[slot, 0])

        def copy_overlap(slot, blk):
            # overlap rows [blk*r - pad_l, blk*r + tail) live at lanes
            # [r, r + ov) of the previous window
            prev = (blk - 1) % 2
            return pltpu.make_async_copy(
                w_ref.at[prev, :, pl.ds(r, ov)],
                w_ref.at[slot, :, pl.ds(0, ov)], sems.at[slot, 1])

        def dma_last(slot):
            # rows [(nb-1)*r + tail, m): r - tail lanes; the trailing
            # tail lanes of the window are masked at compute time
            start = pl.multiple_of((nb - 1) * r + tail, 128)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, r - tail)],
                w_ref.at[slot, :, pl.ds(ov, r - tail)], sems.at[slot, 0])

        def start_dma(blk):
            slot = blk % 2

            @pl.when(blk == 0)
            def _():
                dma_first(slot).start()

            @pl.when((blk > 0) & (blk < nb - 1))
            def _():
                dma_new(slot, blk).start()
                copy_overlap(slot, blk).start()

            @pl.when(blk == nb - 1)
            def _():
                dma_last(slot).start()
                copy_overlap(slot, blk).start()

        def wait_dma(blk):
            slot = blk % 2

            @pl.when(blk == 0)
            def _():
                dma_first(slot).wait()

            @pl.when((blk > 0) & (blk < nb - 1))
            def _():
                dma_new(slot, blk).wait()
                copy_overlap(slot, blk).wait()

            @pl.when(blk == nb - 1)
            def _():
                dma_last(slot).wait()
                copy_overlap(slot, blk).wait()

        @pl.when(i == 0)
        def _():
            start_dma(0)

        # NOTE: the overlap copy for block i+1 reads window i, which is
        # complete only after wait_dma(i) - so prefetch is issued AFTER
        # the wait, unlike v2 (HBM windows are independent there).
        wait_dma(i)

        @pl.when(i + 1 < nb)
        def _():
            start_dma(i + 1)

        slot = i % 2

        def acc_for(mask_kind):
            acc = jnp.zeros((s, r), dtype=jnp.float32)
            lane = None
            if mask_kind is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
            for idx, off in enumerate(offsets):
                a0 = pad_l + off
                contrib = data_ref[idx, :][None, :] \
                    * w_ref[slot, :, a0:a0 + r]
                if mask_kind == "first" and off < 0:
                    contrib = jnp.where(lane >= -off, contrib, 0.0)
                elif mask_kind == "last" and off > 0:
                    contrib = jnp.where(lane < r - off, contrib, 0.0)
                acc = acc + contrib
            return acc

        @pl.when(i == 0)
        def _():
            out_ref[:] = acc_for("first").astype(out_ref.dtype)

        @pl.when((i > 0) & (i < nb - 1))
        def _():
            out_ref[:] = acc_for(None).astype(out_ref.dtype)

        @pl.when(i == nb - 1)
        def _():
            out_ref[:] = acc_for("last").astype(out_ref.dtype)

    return pl.pallas_call(
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
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d * m * s,
            bytes_accessed=(d * m + 2 * m * s) * 4,
            transcendentals=0),
    )(data, xt)


def chain_time(fn, x0, lo=10, hi=60, repeats=4):
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def chain(reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(total(y))
        return time.perf_counter() - t0

    chain(lo)
    best = None
    for _ in range(repeats):
        dt = (chain(hi) - chain(lo)) / (hi - lo)
        best = dt if best is None else min(best, dt)
    return max(best, 1e-9)


def main():
    side = 1536
    m = side * side
    s = 16
    offsets = (-side, -1, 0, 1, side)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       jnp.float32) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    xt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    r = 24576
    pad_l = _round_up(side, 128)
    tail = _round_up(side, 128)
    nnz = len(offsets) * m

    v2 = lambda x: dia_spmm_t(dia, x, block_rows=r)
    y_ref = np.asarray(v2(xt))
    dt2 = chain_time(v2, xt)
    print(f"v2: {nnz / dt2 / 1e9:.2f} Gnnz/s ({dt2 * 1e3:.3f} ms)",
          flush=True)

    v4 = lambda x: dia_spmm_t_v4(data, x, offsets, r, pad_l, tail)
    try:
        y4 = np.asarray(v4(xt))
    except Exception as e:
        print(f"v4 FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:240]}")
        return
    err = np.max(np.abs(y4 - y_ref))
    dt4 = chain_time(v4, xt)
    print(f"v4: {nnz / dt4 / 1e9:.2f} Gnnz/s ({dt4 * 1e3:.3f} ms)  "
          f"err={err:.2e}  speedup {dt2 / dt4:.3f}x", flush=True)


if __name__ == "__main__":
    main()
