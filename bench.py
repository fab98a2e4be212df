"""Benchmark harness - run on real TPU by the round driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: DIA SpMM throughput (nnz/s) on a large 2D-Laplacian
operator - the hot kernel of the solver (the reference's Epetra SpMM;
BASELINE.md "SpMM nnz/s per chip at speed of light").  ``vs_baseline`` is
the fraction of the HBM-bandwidth roofline achieved.

Robustness: the remote-TPU tunnel in this environment can wedge on
long-running kernels, so each phase runs in its own subprocess with a
timeout; the pallas kernel falls back to the XLA path, and a timed-out
solve phase still yields the SpMM headline.

Phases (also runnable directly):
    python bench.py --phase spmm [--impl pallas|xla]
    python bench.py --phase solve
    python bench.py --mesh          # multi-device halo SpMM scaling
"""

import json
import os
import subprocess
import sys
import time

HBM_BYTES_PER_S = {
    "TPU v5 lite": 819e9,   # v5e
    "TPU v4": 1228e9,
    "cpu": 50e9,
}


def _jax_setup():
    import jax

    backend = jax.default_backend()
    dev = jax.devices()[0]
    dev_kind = str(getattr(dev, "device_kind", backend))
    bw = next((v for k, v in HBM_BYTES_PER_S.items() if k in dev_kind),
              HBM_BYTES_PER_S["cpu"])
    return jax, backend != "cpu", dev_kind, bw


def phase_spmm(impl: str) -> None:
    import numpy as np

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    from rails_tpu.sparse.formats import DiaMatrix
    from rails_tpu.sparse.spmm import dia_spmm_pallas

    dtype = jnp.float32 if on_tpu else jnp.float64
    side = 1448 if on_tpu else 128
    m = side * side
    s = 16
    offsets = (-side, -1, 0, 1, side)
    rng = np.random.default_rng(0)
    # scaled so chained applies stay bounded; identical memory traffic
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       dtype=dtype) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    v = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=dtype)

    if impl == "pallas" and on_tpu:
        apply_fn = jax.jit(lambda d, x: dia_spmm_pallas(d, x))
    else:
        impl = "xla"
        apply_fn = jax.jit(lambda d, x: d.matmat(x))
    total_fn = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    print(f"spmm[{impl}]: compiling...", file=sys.stderr, flush=True)
    float(total_fn(apply_fn(dia, v)))  # warm up (compile + run)
    print(f"spmm[{impl}]: timing...", file=sys.stderr, flush=True)

    def chain(reps):
        """Chained applies closed by a data-dependent scalar readback
        (block_until_ready is unreliable through remote tunnels)."""
        y = v
        t0 = time.perf_counter()
        for _ in range(reps):
            y = apply_fn(dia, y)
        float(total_fn(y))
        return time.perf_counter() - t0

    lo, hi = (10, 110) if on_tpu else (2, 10)
    chain(lo)
    d_lo = chain(lo)
    d_hi = chain(hi)
    dt = max(d_hi - d_lo, 1e-9) / (hi - lo)
    nnz = len(offsets) * m
    itemsize = jnp.dtype(dtype).itemsize
    bytes_ideal = (len(offsets) * m + 2 * m * s) * itemsize
    roofline = nnz * bw / bytes_ideal
    print(json.dumps({
        "value": nnz / dt, "vs_baseline": (nnz / dt) / roofline,
        "spmm_rows": m, "spmm_cols": s, "spmm_ms": dt * 1e3,
        "spmm_impl": impl, "roofline_nnz_per_s": roofline,
        "device": dev_kind,
    }))


def phase_solve() -> None:
    import numpy as np
    import scipy.sparse as sp

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    import rails_tpu
    from rails_tpu.sparse.formats import sparse_from_scipy

    dtype = jnp.float32 if on_tpu else jnp.float64
    n = 4096 if on_tpu else 1024
    side = int(np.sqrt(n))
    rng = np.random.default_rng(0)
    lap = sp.kron(sp.eye(side),
                  sp.diags([1.0, -4.0, 1.0], [-1, 0, 1], (side, side))) \
        + sp.kron(sp.diags([1.0, 1.0], [-1, 1], (side, side)), sp.eye(side))
    aop = sparse_from_scipy(lap.tocsr(), fmt="dia", dtype=dtype,
                            is_symmetric=True)
    md = jnp.asarray(rng.uniform(0.5, 1.5, n), dtype=dtype)
    b = jnp.asarray(rng.uniform(0, 1, (n, 8)), dtype=dtype)
    solver = rails_tpu.LyapunovSolver(
        aop, b, rails_tpu.DiagonalOperator(md),
        tol=1e-4, dtype=dtype, expand=6,
        restart_size=120, reduced_size=60, maxit=120)

    def run():
        t0 = time.perf_counter()
        _, _, info = solver.solve(compiled=True)
        return time.perf_counter() - t0, info

    print("solve: compiling + first run...", file=sys.stderr, flush=True)
    warm, _ = run()
    print("solve: steady state...", file=sys.stderr, flush=True)
    wall, info = run()
    print(json.dumps({
        "solve_n": n, "solve_wall_s": wall, "solve_compile_wall_s": warm,
        "solve_iters": info.iter, "solve_converged": bool(info.converged),
        "solve_res": info.res,
    }))


def mesh_scaling_bench():
    import numpy as np

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    from rails_tpu.parallel.halo_spmm import halo_dia_spmm
    from rails_tpu.parallel.mesh import make_mesh
    from rails_tpu.sparse.formats import DiaMatrix

    nd = len(jax.devices())
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
        "metric": "halo_dia_spmm_nnz_per_s", "value": nnz / dt,
        "unit": "nnz/s", "vs_baseline": 0.0, "devices": nd, "rows": m,
    }))


def _run_phase(args, timeout):
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def main():
    if "--mesh" in sys.argv:
        return mesh_scaling_bench()
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        if phase == "spmm":
            impl = "pallas"
            if "--impl" in sys.argv:
                impl = sys.argv[sys.argv.index("--impl") + 1]
            return phase_spmm(impl)
        if phase == "solve":
            return phase_solve()
        raise SystemExit(f"unknown phase {phase}")

    # orchestrate phases in subprocesses (tunnel-wedge isolation)
    out = {"metric": "dia_spmm_nnz_per_s", "value": 0.0, "unit": "nnz/s",
           "vs_baseline": 0.0}
    spmm = _run_phase(["--phase", "spmm", "--impl", "pallas"], 900)
    if spmm is None:
        spmm = _run_phase(["--phase", "spmm", "--impl", "xla"], 900)
    if spmm:
        out.update(spmm)
    solve = _run_phase(["--phase", "solve"], 900)
    if solve:
        out.update(solve)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
