"""Probe: DIA kernel that takes (m, s) input and transposes inside VMEM.

If Mosaic's in-VMEM transpose is cheap, this removes the 2x m*s HBM
read+write pairs that the XLA transposes around dia_spmm_t cost.
"""
import functools
import sys
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_pallas, _edge_block_t


def _round_up(x, mult):
    return ((x + mult - 1) // mult) * mult


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "block_rows", "pad_l", "tail", "patches"))
def _dia_spmm_kt_impl(data, x, offsets: Tuple[int, ...], block_rows: int,
                      pad_l: int, tail: int,
                      patches: Tuple[Tuple[int, int], ...]):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, m = data.shape
    s = x.shape[1]
    r = block_rows
    win = r + pad_l + tail
    num_blocks = m // r
    patch_starts = {p0 for p0, _ in patches}

    def kernel(data_ref, x_ref, out_ref, w_ref, sems):
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
            start = pl.multiple_of(blk * r - pad_l, 128)
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(start, win), :], w_ref.at[slot],
                sems.at[slot])

        if 0 not in patch_starts:
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
            wt = w_ref[slot].T  # (s, win) in-VMEM transpose
            acc = jnp.zeros((s, r), dtype=jnp.float32)
            for idx, off in enumerate(offsets):
                a0 = pad_l + off
                diag = data_ref[idx, :]
                acc = acc + diag[None, :] * wt[:, a0:a0 + r]
            out_ref[:] = acc.T.astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((d, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, s), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win, s), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * d * m * s,
            bytes_accessed=(d * m + 2 * m * s) * 4, transcendentals=0),
    )(data, x)
    for r0, r1 in patches:
        strip = _edge_block_t(data, x.T, offsets, r0, r1).T
        out = jax.lax.dynamic_update_slice(out, strip, (r0, 0))
    return out


def dia_spmm_kt(dia, x, block_rows: int = 8192):
    m, n = dia.shape
    offsets = dia.offsets
    s = x.shape[1]
    d = len(offsets)
    pad_l = _round_up(max(0, -min(offsets)), 128)
    tail = _round_up(max(0, max(offsets)), 128)
    r = min(block_rows, _round_up(m, 128))
    win = r + pad_l + tail
    num_blocks = m // r
    patches = [
        (b * r, (b + 1) * r) for b in range(num_blocks)
        if b * r - pad_l < 0 or b * r - pad_l + win > m]
    if num_blocks * r < m:
        patches.append((num_blocks * r, m))
    if sum(r1 - r0 for r0, r1 in patches) == m:
        return dia.matmat(x)
    return _dia_spmm_kt_impl(dia.data, x, offsets, r, pad_l, tail,
                             tuple(patches))


if __name__ == "__main__":
    side = 1448
    m = side * side
    s = 16
    offsets = (-side, -1, 0, 1, side)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       jnp.float32) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    v = jnp.asarray(rng.uniform(-1, 1, (m, s)), jnp.float32)

    fk = jax.jit(lambda d, x: dia_spmm_kt(d, x))
    tot = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    print("compiling kt...", file=sys.stderr, flush=True)
    y_kt = fk(dia, v)
    # correctness vs XLA reference
    y_ref = dia.matmat(v)
    err = float(jnp.max(jnp.abs(y_kt - y_ref)))
    print(f"max abs err vs XLA: {err:.3e}")

    def chain(fn, x0, reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(dia, y)
        float(tot(y))
        return time.perf_counter() - t0

    nnz = len(offsets) * m
    chain(fk, v, 10)
    d_lo = chain(fk, v, 10)
    d_hi = chain(fk, v, 110)
    dt = max(d_hi - d_lo, 1e-9) / 100
    print(f"kt-kernel: {dt*1e3:.3f} ms/apply  {nnz/dt/1e9:.2f} Gnnz/s")
