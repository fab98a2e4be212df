"""Probe kernel v3 (disjoint slabs, x read exactly once) vs v2 on the
real chip at the bench geometry."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_t

rng = np.random.default_rng(0)


def run(side, s, block_rows, impl):
    m = side * side
    offsets = (-side, -1, 0, 1, side)
    d = len(offsets)
    data = jnp.asarray(rng.uniform(-1, 1, (d, m)), jnp.float32) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    vt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    fn = jax.jit(lambda x: dia_spmm_t(dia, x, block_rows=block_rows,
                                      impl=impl))
    tot = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    label = f"{impl} side={side} s={s} r<={block_rows}"
    try:
        y = fn(vt)
        err = float(jnp.max(jnp.abs(y - dia.matmat(vt.T).T)))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return

    def chain(reps):
        y = vt
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(tot(y))
        return time.perf_counter() - t0

    chain(10)
    best = None
    for _ in range(3):
        dt = max(chain(60) - chain(10), 1e-9) / 50
        best = dt if best is None else min(best, dt)
    nnz = d * m
    byts = (d * m + 2 * m * s) * 4
    roof = nnz * 819e9 / byts
    print(f"{label}: err={err:.2e}  {best*1e3:.3f} ms  "
          f"{nnz/best/1e9:6.2f} Gnnz/s  {byts/best/1e9:6.1f} GB/s  "
          f"vs_roof={nnz/best/roof:.3f}", flush=True)


run(1536, 16, 24576, "v3")
run(1536, 16, 24576, "v2")
run(1536, 16, 18432, "v3")
run(1448, 16, 24576, "v3")
