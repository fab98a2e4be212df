"""Benchmark harness - run on real TPU by the round driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: DIA SpMM throughput (nnz/s) on a large 2D-Laplacian
operator - the hot kernel of the solver (the reference's Epetra SpMM,
BASELINE.md "SpMM nnz/s per chip at speed of light").  ``vs_baseline`` is
the fraction of the HBM-bandwidth roofline achieved (the reference
publishes no numbers; speed-of-light is the stated target).

Secondary numbers (extra keys): end-to-end Lyapunov solve wall-clock to
tolerance on a 2D Laplacian generalized problem, and the per-iteration
cost breakdown.
"""

import json
import time

import numpy as np

HBM_BYTES_PER_S = {
    # peak HBM bandwidth per chip
    "TPU v5 lite": 819e9,   # v5e
    "TPU v4": 1228e9,
    "cpu": 50e9,
}


def main():
    import sys

    import jax
    import jax.numpy as jnp

    if "--mesh" in sys.argv:
        return mesh_scaling_bench()

    backend = jax.default_backend()
    dev = jax.devices()[0]
    dev_kind = getattr(dev, "device_kind", backend)
    bw = next((v for k, v in HBM_BYTES_PER_S.items() if k in str(dev_kind)),
              HBM_BYTES_PER_S["cpu"])

    import rails_tpu
    from rails_tpu.sparse.spmm import dia_spmm
    from rails_tpu.sparse.formats import DiaMatrix

    on_tpu = backend != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64

    # ---------------- DIA SpMM throughput ----------------
    side = 1448 if on_tpu else 128
    m = side * side
    s = 16
    offsets = (-side, -1, 0, 1, side)
    rng = np.random.default_rng(0)
    # scale so chained applies stay bounded (spectral radius < 1);
    # identical memory traffic, numerically safe for long chains
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       dtype=dtype) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    v = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=dtype)

    apply_fn = jax.jit(lambda d, x: dia_spmm(d, x))
    total_fn = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    float(total_fn(apply_fn(dia, v)))  # warm up (compile + first run)

    def chain(reps):
        """Wall time of `reps` chained applies, closed by a data-dependent
        scalar readback (async dispatch through remote tunnels makes
        block_until_ready unreliable; the readback cannot complete before
        every apply in the chain has)."""
        y = v
        t0 = time.perf_counter()
        for _ in range(reps):
            y = apply_fn(dia, y)
        float(total_fn(y))
        return time.perf_counter() - t0

    reps_lo, reps_hi = (10, 110) if on_tpu else (2, 10)
    chain(reps_lo)  # warm the dispatch path
    d_lo = chain(reps_lo)
    d_hi = chain(reps_hi)
    dt = max(d_hi - d_lo, 1e-9) / (reps_hi - reps_lo)
    nnz = len(offsets) * m
    nnz_per_s = nnz / dt
    itemsize = jnp.dtype(dtype).itemsize
    bytes_ideal = (len(offsets) * m + 2 * m * s) * itemsize
    roofline_nnz_per_s = nnz * bw / bytes_ideal
    frac = nnz_per_s / roofline_nnz_per_s

    # ---------------- end-to-end solve ----------------
    import scipy.sparse as sp

    from rails_tpu.sparse.formats import sparse_from_scipy

    n = 4096 if on_tpu else 1024
    side2 = int(np.sqrt(n))
    lap = sp.kron(sp.eye(side2),
                  sp.diags([1.0, -4.0, 1.0], [-1, 0, 1], (side2, side2))) \
        + sp.kron(sp.diags([1.0, 1.0], [-1, 1], (side2, side2)),
                  sp.eye(side2))
    aop = sparse_from_scipy(lap.tocsr(), fmt="dia", dtype=dtype,
                            is_symmetric=True)
    md = jnp.asarray(rng.uniform(0.5, 1.5, n), dtype=dtype)
    b = jnp.asarray(rng.uniform(0, 1, (n, 8)), dtype=dtype)

    solver = rails_tpu.LyapunovSolver(
        aop, b, rails_tpu.DiagonalOperator(md),
        tol=1e-4, dtype=dtype, expand=6,
        restart_size=120, reduced_size=60, maxit=120)

    def run_solve():
        t0 = time.perf_counter()
        _, _, info = solver.solve(compiled=True)
        return time.perf_counter() - t0, info

    warm_wall, _ = run_solve()       # includes compilation
    solve_wall, info = run_solve()   # steady state

    out = {
        "metric": "dia_spmm_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s",
        "vs_baseline": frac,
        "spmm_rows": m,
        "spmm_cols": s,
        "spmm_ms": dt * 1e3,
        "roofline_nnz_per_s": roofline_nnz_per_s,
        "device": str(dev_kind),
        "solve_n": n,
        "solve_wall_s": solve_wall,
        "solve_compile_wall_s": warm_wall,
        "solve_iters": info.iter,
        "solve_converged": bool(info.converged),
        "solve_res": info.res,
    }
    print(json.dumps(out))


def mesh_scaling_bench():
    """SpMM scaling over all local devices (halo-exchange distributed DIA).

    Reports aggregate nnz/s on the full mesh vs the single-device kernel -
    the BASELINE.md scaling-efficiency measurement (>=80% target 1 host ->
    4 hosts on v5p).  With one local chip this degenerates to the
    single-device number; run on a pod slice for the real measurement.
    """
    import time

    import jax
    import jax.numpy as jnp

    from rails_tpu.parallel.halo_spmm import halo_dia_spmm
    from rails_tpu.parallel.mesh import make_mesh
    from rails_tpu.sparse.formats import DiaMatrix

    nd = len(jax.devices())
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    side = 1448 if on_tpu else 128
    m = (side * side // (nd * 128)) * nd * 128
    offsets = (-side, -1, 0, 1, side)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       dtype=dtype) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    v = jnp.asarray(rng.uniform(-1, 1, (m, 16)), dtype=dtype)
    mesh = make_mesh(nd)
    fn = jax.jit(lambda d, x: halo_dia_spmm(d, x, mesh))
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    float(total(fn(dia, v)))

    def chain(reps):
        y = v
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(dia, y)
        float(total(y))
        return time.perf_counter() - t0

    lo, hi = (10, 110) if on_tpu else (2, 10)
    chain(lo)
    dt = max(chain(hi) - chain(lo), 1e-9) / (hi - lo)
    nnz = len(offsets) * m
    print(json.dumps({
        "metric": "halo_dia_spmm_nnz_per_s",
        "value": nnz / dt,
        "unit": "nnz/s",
        "vs_baseline": 0.0,
        "devices": nd,
        "rows": m,
    }))


if __name__ == "__main__":
    main()
