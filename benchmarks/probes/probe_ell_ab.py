"""Probe: masked vs sliced windowed-ELL layout A/B on the live device.

Round-3 measurement (BENCH_r03_tpu_prerun.json): the masked layout at
w=384 needs w/128 = 3 gathers per slot-chunk and runs at 0.57 of the
measured gather-issue ceiling.  The sliced layout re-buckets entries so
each (chunk, slot) touches ONE sub-block - 1 gather per slot, ceiling
3x higher - at the price of slot padding L' >= L.  This probe measures
both layouts at the bench geometry and reports the winner.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from rails_tpu.sparse.ell_spmm import ell_spmm_t, ell_windowize


def chain_time(fn, x0, lo=10, hi=40, repeats=3):
    # min each chain length separately, then difference (min-of-
    # differences is biased low under dispatch stalls - see bench.py
    # _chain_time)
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    def chain(reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(total(y))
        return time.perf_counter() - t0

    chain(lo)
    d_los = [chain(lo) for _ in range(repeats)]
    d_his = [chain(hi) for _ in range(repeats)]
    return max(min(d_his) - min(d_los), 1e-9) / (hi - lo)


def build(m, ell_l, band, dtype):
    rng = np.random.default_rng(0)
    base = np.arange(m)
    idx = np.clip(base[:, None] + rng.integers(-band, band + 1, (m, ell_l)),
                  0, m - 1)
    val = rng.uniform(-1, 1, (m, ell_l)) * 0.2
    a = sp.coo_matrix((val.ravel(), (np.repeat(base, ell_l), idx.ravel())),
                      shape=(m, m)).tocsr()
    deg = np.diff(a.indptr)
    ell_l2 = int(deg.max())
    indices = np.zeros((m, ell_l2), np.int64)
    values = np.zeros((m, ell_l2), dtype)
    first = a.indices[a.indptr[:-1]]
    indices[:] = first[:, None]
    rows = np.repeat(np.arange(m), deg)
    slots = np.arange(a.nnz) - np.repeat(a.indptr[:-1], deg)
    indices[rows, slots] = a.indices
    values[rows, slots] = a.data
    return indices, values, int(a.nnz)


def main():
    m, ell_l, band, s = 1 << 21, 8, 64, 16
    dtype = np.float32
    indices, values, nnz = build(m, ell_l, band, dtype)
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    ref = None
    for layout in ("masked", "sliced"):
        well = ell_windowize(indices, values, (m, m), layout=layout)
        if well is None:
            print(f"{layout}: does not qualify")
            continue
        lp = well.lidx.shape[0]
        fn = jax.jit(lambda x, well=well: ell_spmm_t(well, x))
        try:
            y = np.asarray(fn(xt))
        except Exception as e:
            print(f"{layout}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:240]}")
            continue
        if ref is None:
            ref = y
        else:
            print(f"  max |sliced - masked| = "
                  f"{np.max(np.abs(y - ref)):.3e}")
        dt = chain_time(fn, xt)
        print(f"{layout}: w={well.w} L'={lp} (pad {lp / ell_l:.2f}x)  "
              f"{nnz / dt / 1e9:.2f} Gnnz/s  ({dt * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
