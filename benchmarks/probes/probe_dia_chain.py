"""Probe: how much of the DIA SpMM gap to the HBM roofline is Python/
dispatch overhead vs kernel-intrinsic?

(a) python-loop chain of jitted applies (the bench's measurement),
(b) one jit with lax.fori_loop of K applies (zero dispatch inside),
(c) block_rows sweep.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_t

side = 1536
m = side * side
s = 16
offsets = (-side, -1, 0, 1, side)
rng = np.random.default_rng(0)
data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                   dtype=jnp.float32) * 0.12
dia = DiaMatrix(data, offsets, (m, m))
vt = jnp.asarray(rng.uniform(-1, 1, (s, m)), dtype=jnp.float32)
nnz = len(offsets) * m
total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))


def time_python_chain(fn, reps=60):
    y = fn(vt)
    float(total(y))
    best = None
    for _ in range(3):
        y = vt
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(total(y))
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


def time_fori_chain(fn, reps=60):
    @jax.jit
    def chain(x):
        return lax.fori_loop(0, reps, lambda i, v: fn(v), x)

    float(total(chain(vt)))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(total(chain(vt)))
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for br in (16384, 24576, 32768, 49152):
        fn = jax.jit(lambda x, br=br: dia_spmm_t(dia, x, block_rows=br))
        dt_py = time_python_chain(fn)
        dt_fl = time_fori_chain(fn)
        print(f"block_rows={br}: python-chain {nnz/dt_py/1e9:.2f} Gnnz/s"
              f"  fori-chain {nnz/dt_fl/1e9:.2f} Gnnz/s"
              f"  dispatch-overhead {(dt_py-dt_fl)*1e6:.0f} us/apply")
