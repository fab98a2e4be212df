"""Probe kernel v2 (in-kernel edges): correctness vs XLA + throughput on
the real chip, for the current bench geometry (side=1448) and the
128-aligned geometry (side=1536), across block sizes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_t

rng = np.random.default_rng(0)


def run(side, s, block_rows):
    m = side * side
    offsets = (-side, -1, 0, 1, side)
    d = len(offsets)
    data = jnp.asarray(rng.uniform(-1, 1, (d, m)), jnp.float32) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    vt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    fn = jax.jit(lambda dd, x: dia_spmm_t(dd, x, block_rows=block_rows))
    tot = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    label = f"side={side} s={s} r<={block_rows}"
    try:
        y = fn(dia, vt)
        ref = dia.matmat(vt.T).T
        err = float(jnp.max(jnp.abs(y - ref)))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
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
    nnz = d * m
    byts = (d * m + 2 * m * s) * 4
    roof = nnz * 819e9 / byts
    print(f"{label}: err={err:.2e}  {dt*1e3:.3f} ms  "
          f"{nnz/dt/1e9:6.2f} Gnnz/s  {byts/dt/1e9:6.1f} GB/s  "
          f"vs_roof={nnz/dt/roof:.3f}", flush=True)


run(1448, 16, 32768)
run(1448, 16, 27904)
run(1536, 16, 32768)
run(1536, 16, 27904)
run(1536, 16, 24576)
