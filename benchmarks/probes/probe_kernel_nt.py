"""Probe: native-layout (m, s) DIA SpMM kernel variant, v2.

The production solver keeps V in (m, k); the v2 transposed kernel wants
(s, m), so dia_spmm pays two XLA transposes per apply - measured 1.35x
on the round-3 bench (spmm_wrapper_overhead), consistent with 4 extra
HBM passes of x/y traffic.

v1 of this probe held (win, 16) VMEM windows - Mosaic pads the 16-lane
minor dim to 128 (8x memory) and the double-buffered scratch blew VMEM
(remote compile HTTP 500).  v2 views x (m, 16) as its free bitcast
(m/8, 128): every VMEM buffer stays compact, and the kernel reaches the
(16, win) full-lane compute layout by an in-register reshape +
transpose, with the reverse chain on the way out.

MEASURED CONCLUSION (round 3): dead end on this toolchain.  Plain 2D
transposes compile (probe_transpose_kernel.py: (32768, 16) ok), but
the lane->sublane reshape v2 needs fails Mosaic at every size
(probe_reshape_kernel.py: HTTP 500), and without it the padded-buffer
variant only fits VMEM at block sizes whose window overlap costs as
much as the XLA transposes it saves.  End-to-end the wrapper overhead
is ~4% of a solve iteration (Gram GEMMs dominate), so the production
path keeps the transposed kernel + XLA transposes, with the overhead
recorded honestly as spmm_wrapper_overhead in the bench artifact.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import _round_up, dia_spmm_t


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "block_rows", "pad_l", "tail", "s"))
def dia_spmm_nt(data, x_r, offsets, block_rows: int, pad_l: int,
                tail: int, s: int):
    """y_r (m/8, 128) = reshaped A @ x for x_r = x.reshape(m/8, 128),
    x (m, s) row-major, s*8 == 128.  First/last blocks masked like v2;
    assumes m % block_rows == 0."""
    d, m = data.shape[0], data.shape[1]
    r = block_rows
    win = r + pad_l + tail
    nb = m // r
    pack = 128 // s  # rows packed per 128-lane line (8 at s=16)
    first_special = pad_l > 0
    last_special = tail > 0

    def kernel(data_ref, x_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def dma_first(slot):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(0, (r + tail) // pack), :],
                w_ref.at[slot, pl.ds(pad_l // pack, (r + tail) // pack), :],
                sems.at[slot])

        def dma_interior(slot, blk):
            start = pl.multiple_of((blk * r - pad_l) // pack, 128 // pack)
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(start, win // pack), :], w_ref.at[slot],
                sems.at[slot])

        def dma_last(slot):
            have = (pad_l + r) // pack
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(((nb - 1) * r - pad_l) // pack, have), :],
                w_ref.at[slot, pl.ds(0, have), :], sems.at[slot])

        def on_dma(blk, go):
            slot = blk % 2
            lo_ok = (blk > 0) if first_special else (blk >= 0)
            hi_ok = (blk < nb - 1) if last_special else (blk < nb)
            if first_special:
                @pl.when(blk == 0)
                def _():
                    go(dma_first(slot))
            if last_special:
                @pl.when(blk == nb - 1)
                def _():
                    go(dma_last(slot))

            @pl.when(lo_ok & hi_ok)
            def _():
                go(dma_interior(slot, blk))

        @pl.when(i == 0)
        def _():
            on_dma(0, lambda c: c.start())

        @pl.when(i + 1 < nb)
        def _():
            on_dma(i + 1, lambda c: c.start())

        on_dma(i, lambda c: c.wait())
        slot = i % 2

        w = w_ref[slot][:]                      # (win/pack, 128) compact
        wt = jnp.swapaxes(jnp.reshape(w, (win, s)), 0, 1)  # (s, win)

        def acc_for(mask_kind):
            acc = jnp.zeros((s, r), dtype=jnp.float32)
            lane = None
            if mask_kind is not None:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
            for idx, off in enumerate(offsets):
                a0 = pad_l + off
                contrib = data_ref[idx, :][None, :] * wt[:, a0:a0 + r]
                if mask_kind == "first" and off < 0:
                    contrib = jnp.where(lane >= -off, contrib, 0.0)
                elif mask_kind == "last" and off > 0:
                    contrib = jnp.where(lane < r - off, contrib, 0.0)
                acc = acc + contrib
            return acc

        def store(acc):
            back = jnp.swapaxes(acc, 0, 1)      # (r, s)
            out_ref[:] = jnp.reshape(
                back, (r // pack, 128)).astype(out_ref.dtype)

        interior = jnp.full((), True)
        if first_special:
            interior &= i != 0

            @pl.when(i == 0)
            def _():
                store(acc_for("first"))
        if last_special:
            interior &= i != nb - 1

            @pl.when((i == nb - 1) & (i != 0 if first_special else True))
            def _():
                store(acc_for("last"))

        @pl.when(interior)
        def _():
            store(acc_for(None))

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r // pack, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m // pack, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win // pack, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d * m * s,
            bytes_accessed=(d * m + 2 * m * s) * 4,
            transcendentals=0),
    )(data, x_r)


def chain_time(fn, x0, lo=10, hi=40, repeats=3):
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
    x = jnp.asarray(rng.uniform(-1, 1, (m, s)), jnp.float32)
    r = 24576
    pad_l = _round_up(side, 128)
    tail = _round_up(side, 128)

    wrap = jax.jit(lambda v: dia_spmm_t(dia, v.T, block_rows=r).T)
    nt = jax.jit(lambda v: dia_spmm_nt(
        data, v.reshape(m // 8, 128), offsets, r, pad_l, tail, s
    ).reshape(m, s))
    y_ref = wrap(x)
    try:
        y_nt = nt(x)
    except Exception as e:
        print(f"nt FAILED to compile/run: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}")
        return
    err = float(jnp.max(jnp.abs(y_nt - y_ref)))
    print(f"max |nt - wrapped| = {err:.3e}")
    nnz = len(offsets) * m
    dt_w = chain_time(wrap, x)
    dt_n = chain_time(nt, x)
    print(f"wrapped (2 XLA transposes): {nnz / dt_w / 1e9:.2f} Gnnz/s "
          f"({dt_w * 1e3:.3f} ms)")
    print(f"native-layout kernel:      {nnz / dt_n / 1e9:.2f} Gnnz/s "
          f"({dt_n * 1e3:.3f} ms)  speedup {dt_w / dt_n:.2f}x")


if __name__ == "__main__":
    main()
