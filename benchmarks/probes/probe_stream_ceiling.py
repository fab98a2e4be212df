"""Probe: what does this chip actually stream?

1. XLA elementwise y = 2x on the same-size array (the achievable-BW
   ceiling for any HBM-bound kernel through this measurement harness).
2. dia_spmm_t without edge patches (kernel-only cost).
3. dia_spmm_t big-block variants.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.sparse.formats import DiaMatrix
from rails_tpu.sparse.spmm import dia_spmm_t, _dia_spmm_t_impl, _round_up

side = 1448
m = side * side
rng = np.random.default_rng(0)


def timeit(fn, x0, label, bytes_per_apply, lo=10, hi=60):
    tot = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    try:
        float(tot(fn(x0)))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return

    def chain(reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(tot(y))
        return time.perf_counter() - t0

    chain(lo)
    d_lo = chain(lo)
    d_hi = chain(hi)
    dt = max(d_hi - d_lo, 1e-9) / (hi - lo)
    print(f"{label}: {dt*1e3:.3f} ms  {bytes_per_apply/dt/1e9:6.1f} GB/s",
          flush=True)


for s in (8, 16):
    x = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    timeit(jax.jit(lambda v: v * 0.999), x, f"xla 2x stream (s={s}) ",
           2 * m * s * 4)

offsets = (-side, -1, 0, 1, side)
d = len(offsets)
data = jnp.asarray(rng.uniform(-1, 1, (d, m)), jnp.float32) * 0.12
dia = DiaMatrix(data, offsets, (m, m))


def kern_nopatch(r):
    pad_l = _round_up(side, 128)
    tail = _round_up(side, 128)
    return lambda x: _dia_spmm_t_impl(data, x, offsets, r, pad_l, tail, ())


byts = (d * m + 2 * m * 16) * 4
x16 = jnp.asarray(rng.uniform(-1, 1, (16, m)), jnp.float32)
for r in (16384, 27904):
    nb = m // r
    timeit(jax.jit(kern_nopatch(r)), x16,
           f"kernel NO patches r={r} (blocks={nb})", byts)
    timeit(jax.jit(lambda v, r=r: dia_spmm_t(dia, v, block_rows=r)), x16,
           f"kernel +  patches r={r}              ", byts)
x8 = jnp.asarray(rng.uniform(-1, 1, (8, m)), jnp.float32)
timeit(jax.jit(lambda v: dia_spmm_t(dia, v, block_rows=49152)), x8,
       "kernel s=8 r=49k                     ", (d * m + 2 * m * 8) * 4)
