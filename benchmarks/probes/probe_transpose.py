"""Probe: cost of the (m,s)<->(s,m) transposes around the DIA kernel.

Chains dia_spmm_t (pure transposed layout, no XLA transposes) against
dia_spmm_pallas (transpose-in + kernel + transpose-out) on the real TPU.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_pallas, dia_spmm_t

side = 1448
m = side * side
s = 16
offsets = (-side, -1, 0, 1, side)
rng = np.random.default_rng(0)
data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)), jnp.float32) * 0.12
dia = DiaMatrix(data, offsets, (m, m))
v = jnp.asarray(rng.uniform(-1, 1, (m, s)), jnp.float32)
vt = jnp.asarray(np.asarray(v).T)

ft = jax.jit(lambda d, x: dia_spmm_t(d, x))
fp = jax.jit(lambda d, x: dia_spmm_pallas(d, x))
tot = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

print("compiling...", file=sys.stderr, flush=True)
float(tot(ft(dia, vt)))
float(tot(fp(dia, v)))


def chain(fn, x0, reps):
    y = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(dia, y)
    float(tot(y))
    return time.perf_counter() - t0


nnz = len(offsets) * m
for name, fn, x0 in [("t-layout", ft, vt), ("pallas+T", fp, v)]:
    chain(fn, x0, 10)
    d_lo = chain(fn, x0, 10)
    d_hi = chain(fn, x0, 110)
    dt = max(d_hi - d_lo, 1e-9) / 100
    print(f"{name}: {dt*1e3:.3f} ms/apply  {nnz/dt/1e9:.2f} Gnnz/s")
