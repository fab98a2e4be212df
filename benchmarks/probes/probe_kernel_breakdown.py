"""Probe: where does the DIA kernel's time go?

Sweeps offset structure (count, alignment), block size, and multivector
width on the real TPU to separate HBM streaming cost from lane-rotation
(unaligned slice) cost and pipeline overheads.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_t

side = 1448
m = side * side
rng = np.random.default_rng(0)


def bench(offsets, s, block_rows, label):
    d = len(offsets)
    data = jnp.asarray(rng.uniform(-1, 1, (d, m)), jnp.float32) * (0.6 / d)
    dia = DiaMatrix(data, offsets, (m, m))
    vt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    fn = jax.jit(lambda dd, x: dia_spmm_t(dd, x, block_rows=block_rows))
    tot = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    try:
        float(tot(fn(dia, vt)))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return

    def chain(reps):
        y = vt
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(dia, y)
        float(tot(y))
        return time.perf_counter() - t0

    chain(10)
    d_lo = chain(10)
    d_hi = chain(60)
    dt = max(d_hi - d_lo, 1e-9) / 50
    byts = (d * m + 2 * m * s) * 4
    gbs = byts / dt / 1e9
    nnz = d * m
    print(f"{label}: {dt*1e3:.3f} ms  {nnz/dt/1e9:6.2f} Gnnz/s  "
          f"{gbs:6.1f} GB/s(ideal-bytes)", flush=True)


# 1. pure stream: single main diagonal (no rotation at all: off=0)
bench((0,), 16, 16384, "d=1 off=(0,)           s=16 r=16k")
# 2. five ALIGNED offsets (same bytes as the real case, rotations aligned)
bench((-1536, -128, 0, 128, 1536), 16, 16384, "d=5 aligned             s=16 r=16k")
# 3. the real Laplacian offsets
bench((-side, -1, 0, 1, side), 16, 16384, "d=5 real                s=16 r=16k")
# 4. block size sweep on the real case
bench((-side, -1, 0, 1, side), 16, 8192, "d=5 real                s=16 r=8k ")
bench((-side, -1, 0, 1, side), 16, 27904, "d=5 real                s=16 r=27k")
# 5. width sweep
bench((-side, -1, 0, 1, side), 8, 16384, "d=5 real                s=8  r=16k")
bench((-side, -1, 0, 1, side), 32, 16384, "d=5 real                s=32 r=16k")
