"""Benchmark harness - run on real TPU by the round driver.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: DIA SpMM throughput (nnz/s) on a large 2D-Laplacian
operator - the hot kernel of the solver (the reference's Epetra SpMM;
BASELINE.md "SpMM nnz/s per chip at speed of light").  ``vs_baseline`` is
the fraction of the HBM-bandwidth roofline achieved; ``vs_stream`` is
the fraction of the *measured* achievable stream bandwidth (an XLA
elementwise pass over the same bytes) - the nameplate 819 GB/s is not
reachable by any kernel on this chip (XLA's own 2x-stream measures
~550-650 GB/s through this harness), so vs_stream is the honest
speed-of-light ratio.

Phases (each in its own subprocess - the remote-TPU tunnel can wedge):
    python bench.py --phase spmm [--impl pallas|xla]
    python bench.py --phase solve       # n=4096 generalized solve, f32
    python bench.py --phase accuracy    # refined f32 solve to 1e-8
    python bench.py --phase ell         # unstructured SpMM + MOC solve
    python bench.py --phase hub         # power-law hub split vs take path
    python bench.py --phase continuation  # warm-start sequence
    python bench.py --phase scale       # n=65536 refined solve
    python bench.py --mesh              # multi-device halo comm artifact
    (add --cpu to any of the above for the 8-virtual-device CPU run)

The orchestrator prints the full consolidated line after every phase,
then a compact (< ~1,500 chars) headline line LAST - the driver's
tail-window parser takes the last JSON line (VERDICT r04 weak 1).

Timeout-robust orchestration (round-2 lesson: a driver-level timeout
erased every phase because the consolidated line printed only at the
very end): the orchestrator prints the cumulative consolidated JSON
line after EVERY phase - the last JSON line on stdout wins for the
parser - runs phases most-important-first under a total wall-clock
budget (RAILS_BENCH_BUDGET_S, default 1380 s), and records per-phase
errors/timeouts in a "phases" field instead of dropping them.
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
    if "--cpu" in sys.argv:
        # reproducible multi-device run on 8 virtual CPU devices (the
        # mesh-scaling artifact geometry; real pods substitute chips)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    backend = jax.default_backend()
    dev = jax.devices()[0]
    dev_kind = str(getattr(dev, "device_kind", backend))
    bw = next((v for k, v in HBM_BYTES_PER_S.items() if k in dev_kind),
              HBM_BYTES_PER_S["cpu"])
    return jax, backend != "cpu", dev_kind, bw


def _chain_time(fn, x0, total_fn, lo, hi, repeats=3):
    """Differenced chain timing (chain closes with a data-dependent
    readback; differencing removes fixed overhead).  Each chain length
    is min'd over repeats SEPARATELY, then differenced: min-of-
    differences is biased low whenever noise inflates a d_lo sample
    (one tunnel stall made a 6-repeat run report 1.5x the roofline),
    while the min of each length independently strips stalls from both
    before the subtraction."""
    def chain(reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(total_fn(y))
        return time.perf_counter() - t0

    chain(lo)  # warm
    d_los, d_his = [], []
    for _ in range(repeats):
        d_los.append(chain(lo))
        d_his.append(chain(hi))
    return max(min(d_his) - min(d_los), 1e-9) / (hi - lo)


def phase_spmm(impl: str) -> None:
    import numpy as np

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    from rails_tpu.sparse.formats import DiaMatrix
    from rails_tpu.sparse.spmm import dia_spmm_t

    dtype = jnp.float32 if on_tpu else jnp.float64
    # 1536^2 rows: 128-aligned lanes, the +-side offsets are 128-aligned,
    # and block_rows=24576 divides m exactly (96 blocks, no remainder)
    side = 1536 if on_tpu else 128
    m = side * side
    s = 16
    offsets = (-side, -1, 0, 1, side)
    rng = np.random.default_rng(0)
    # scaled so chained applies stay bounded; identical memory traffic
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       dtype=dtype) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    vt = jnp.asarray(rng.uniform(-1, 1, (s, m)), dtype=dtype)

    if impl == "pallas" and on_tpu:
        apply_fn = jax.jit(lambda x: dia_spmm_t(dia, x, block_rows=24576))
    else:
        impl = "xla"
        apply_fn = jax.jit(lambda x: dia.matmat(x.T).T)
    total_fn = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    print(f"spmm[{impl}]: compiling...", file=sys.stderr, flush=True)
    float(total_fn(apply_fn(vt)))  # warm up (compile + run)
    print(f"spmm[{impl}]: timing...", file=sys.stderr, flush=True)
    lo, hi = (10, 60) if on_tpu else (2, 10)
    # repeats=6: the remote-TPU tunnel occasionally stalls a dispatch
    # mid-chain, inflating one repeat; the min over more repeats keeps
    # the stream ceiling and wrapper-overhead ratios stable run to run
    # (r03 observed 636 vs 713 GB/s stream across two 3-repeat runs)
    dt = _chain_time(apply_fn, vt, total_fn, lo, hi, repeats=6)
    nnz0 = len(offsets) * m
    roof0 = nnz0 * bw / ((len(offsets) * m + 2 * m * s)
                         * jnp.dtype(dtype).itemsize)
    # partial line before the stream/wrapper measurements: a wedged
    # tunnel mid-phase must not erase the headline kernel number
    print(json.dumps({
        "value": nnz0 / dt, "vs_baseline": (nnz0 / dt) / roof0,
        "timing_suspect": bool((nnz0 / dt) > 1.05 * roof0),
        "spmm_rows": m, "spmm_cols": s, "spmm_ms": dt * 1e3,
        "spmm_impl": impl, "device": dev_kind,
    }), flush=True)

    # measured stream ceiling: XLA elementwise over the same array
    stream_fn = jax.jit(lambda x: x * 0.999)
    float(total_fn(stream_fn(vt)))
    dt_stream = _chain_time(stream_fn, vt, total_fn, lo, hi, repeats=6)
    stream_gbs = 2 * m * s * jnp.dtype(dtype).itemsize / dt_stream / 1e9

    nnz = len(offsets) * m
    itemsize = jnp.dtype(dtype).itemsize
    bytes_ideal = (len(offsets) * m + 2 * m * s) * itemsize
    roofline = nnz * bw / bytes_ideal
    kernel_gbs = bytes_ideal / dt / 1e9
    out = {
        "value": nnz / dt, "vs_baseline": (nnz / dt) / roofline,
        # no kernel can beat the HBM roofline: a ratio past it means the
        # differenced timing was corrupted by a tunnel stall - flag it
        # rather than publish an impossible headline
        "timing_suspect": bool((nnz / dt) > 1.05 * roofline),
        "spmm_rows": m, "spmm_cols": s, "spmm_ms": dt * 1e3,
        "spmm_impl": impl, "spmm_layout": "transposed (s, m)",
        "roofline_nnz_per_s": roofline,
        "kernel_gbs": kernel_gbs, "stream_gbs": stream_gbs,
        "vs_stream": kernel_gbs / stream_gbs,
        "device": dev_kind,
    }
    print(json.dumps(out), flush=True)  # partial result survives a kill
    if impl == "pallas":
        # production-layout wrapper: solver state is (m, s), the kernel
        # wants (s, m) - dia_spmm inserts the two transposes.  Record
        # the overhead so the headline is honest about the shipped path.
        from rails_tpu.sparse.spmm import dia_spmm

        v = vt.T
        wrap_fn = jax.jit(lambda x: dia_spmm(dia, x))
        float(total_fn(wrap_fn(v)))
        # alternate raw/wrapped chains and take the median ratio: the
        # two paths drift together under tunnel/clock noise, so paired
        # sampling cancels it (independent min-of-N gave 1.35 / 0.94 /
        # 0.80 across three r03 runs for the same binary)
        import statistics
        ratios = []
        for _ in range(5):
            d_raw = _chain_time(apply_fn, vt, total_fn, lo, hi, repeats=1)
            d_wrap = _chain_time(wrap_fn, v, total_fn, lo, hi, repeats=1)
            ratios.append(d_wrap / d_raw)
        ratio = statistics.median(ratios)
        # the wrapped path cannot physically beat the bare kernel it
        # contains: a median ratio < 1 is timing noise (VERDICT r03 weak
        # 4 - the pre-run artifact published 0.94).  Clamp to 1.0 and
        # keep the raw number on record.
        out["spmm_wrapper_overhead_raw"] = ratio
        if ratio < 1.0:
            out["spmm_wrapper_overhead_clamped"] = True
            ratio = 1.0
        out["spmm_wrapped_nnz_per_s"] = nnz / (dt * ratio)
        out["spmm_wrapper_overhead"] = ratio
    print(json.dumps(out))


def _gather_issue_rate(jax, jnp, dtype, s, nb=2048, g=64):
    """Measured tpu.dynamic_gather issue rate (gathers/s) for the ELL
    kernel's exact operand shape: (s_pad, 128) lane gather from VMEM.
    Grid of ``nb`` steps, ``g`` index-shifted gathers per step (shifted
    indices defeat CSE; independent gathers let the issue pipeline fill,
    which is the ceiling we want)."""
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s_pad = -(-s // 8) * 8
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, 128, (s_pad, 128)), jnp.int32)

    def kernel(idx_ref, x_ref, o_ref):
        acc = jnp.zeros((s_pad, 128), jnp.float32)
        base = idx_ref[:]
        for k in range(g):
            loc = (base + k) & 127
            acc = acc + jnp.take_along_axis(x_ref[:], loc, axis=1)
        o_ref[:] = (acc * (1.0 / g)).astype(o_ref.dtype)

    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((s_pad, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((s_pad, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((s_pad, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, 128 * nb), dtype),
    )(idx, x))
    x0 = jnp.asarray(rng.uniform(-1, 1, (s_pad, 128 * nb)), dtype)
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    float(total(fn(x0)))
    dt = _chain_time(fn, x0, total, 5, 25)
    return nb * g / dt


def phase_ell() -> None:
    """Unstructured-sparsity SpMM (windowed-ELL Pallas kernel) + the
    real-data MOC Schur solve, both on the live device.

    The banded-unstructured geometry (random per-row column picks within
    a +-64 band, L=8 slots) is the post-RCM shape of general matrices;
    the XLA take path is timed on the same operator as the honest
    baseline.  MOC: the n=1536 DataErik ocean problem end-to-end
    (border, Schur reduction, solve to the reference's 1e-3 target,
    matlab/test/test_MOC.m:26-35)."""
    import numpy as np
    import scipy.sparse as sp

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    from rails_tpu.sparse.formats import sparse_from_scipy

    dtype = jnp.float32 if on_tpu else jnp.float64
    m, ell_l, band, s = (1 << 21 if on_tpu else 1 << 14), 8, 64, 16
    rng = np.random.default_rng(0)
    base = np.arange(m)
    idx = np.clip(base[:, None] + rng.integers(-band, band + 1, (m, ell_l)),
                  0, m - 1)
    val = rng.uniform(-1, 1, (m, ell_l)) * 0.2
    a = sp.coo_matrix((val.ravel(), (np.repeat(base, ell_l), idx.ravel())),
                      shape=(m, m)).tocsr()
    op = sparse_from_scipy(a, fmt="ell", dtype=dtype)
    nnz = int(a.nnz)
    vt = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=dtype)
    total_fn = jax.jit(lambda x: jnp.sum(jnp.abs(x)))

    well = op.fwd.well
    out = {"ell_rows": m, "ell_slots": ell_l, "ell_nnz": nnz,
           "ell_windowed": well is not None,
           "ell_window": getattr(well, "w", None),
           "ell_nc": getattr(well, "nc", 1),
           "ell_layout": ("sliced" if getattr(well, "sb", None) is not None
                          else "masked") if well is not None else None,
           "device": dev_kind}
    kern_fn = jax.jit(lambda x: op.matmat(x))
    print("ell: compiling kernel...", file=sys.stderr, flush=True)
    float(total_fn(kern_fn(vt)))
    lo, hi = (10, 60) if on_tpu else (2, 10)
    dt = _chain_time(kern_fn, vt, total_fn, lo, hi)
    out["ell_spmm_nnz_per_s"] = nnz / dt
    itemsize = jnp.dtype(dtype).itemsize
    bytes_ideal = (2 * ell_l * m + 2 * m * s) * itemsize
    out["ell_roofline_frac"] = (bytes_ideal / dt / 1e9) / (bw / 1e9)
    print(json.dumps(out), flush=True)  # partial result survives a kill

    # hardware gather ceiling (VERDICT r02 item 5): the kernel is
    # gather-issue-bound, not HBM-bound, so the honest speed-of-light is
    # the measured tpu.dynamic_gather issue rate, recorded the way
    # stream_gbs is for DIA.  The microkernel below does only (s,128)
    # lane gathers from VMEM (no DMA, no FMA chain) at the same shapes.
    if on_tpu and well is not None:
        try:
            gops = _gather_issue_rate(jax, jnp, dtype, s)
            out["gather_ops_per_s"] = gops
            # one gather covers 128 row-entries; masked layout needs
            # w/128 gathers per slot-chunk, sliced needs exactly 1
            nw_eff = 1 if well.sb is not None else max(well.w // 128, 1)
            out["ell_gather_ceiling_nnz_per_s"] = gops * 128 / nw_eff
            out["ell_vs_gather_ceiling"] = (
                (nnz / dt) / out["ell_gather_ceiling_nnz_per_s"])
        except Exception as e:  # noqa: BLE001 - ceiling is optional
            out["gather_probe_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(out), flush=True)

    xla_fn = jax.jit(lambda x: op.fwd.matmat(x))
    print("ell: compiling xla path...", file=sys.stderr, flush=True)
    float(total_fn(xla_fn(vt)))
    dt_x = _chain_time(xla_fn, vt, total_fn, 2, 6)
    out["ell_xla_nnz_per_s"] = nnz / dt_x
    out["ell_vs_xla"] = dt_x / dt
    print(json.dumps(out), flush=True)

    # MOC end-to-end (reference target: residual < 1e-3, test_MOC.m)
    try:
        import rails_tpu
        import rails_tpu.io as rio
        from rails_tpu.schur import schur_reduce

        a, mm, b = rio.load_moc_problem()
        a2, m2, b2 = rio.add_border(a, mm, b, rio.moc_border(a.shape[0]))
        t0 = time.perf_counter()
        red = schur_reduce(a2, m2, b2)
        v, t, info = rails_tpu.solve(
            red.operator, jnp.asarray(red.bs, dtype=dtype), red.ms,
            maxit=1000, tol=1e-3, dtype=dtype)
        moc_wall = time.perf_counter() - t0
        sv = np.asarray(red.operator.matmat(v))
        msd = np.asarray(red.ms_diag)
        vn, tn = np.asarray(v), np.asarray(t)
        bs = np.asarray(red.bs)
        svt = sv @ tn
        r = svt @ (vn * msd[:, None]).T
        r = r + r.T + bs @ bs.T
        out.update({
            "moc_wall_s": moc_wall, "moc_iters": int(info.iter),
            "moc_converged": bool(info.converged),
            "moc_res_fro": float(np.linalg.norm(r, "fro")),
            "moc_res_target": 1e-3,
        })
    except FileNotFoundError:
        out["moc_wall_s"] = None  # DataErik not mounted
    except Exception as e:  # noqa: BLE001 - keep the kernel numbers
        out["moc_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out))


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
    # maxit 200 leaves >= 40% headroom over the ~120 iterations this
    # problem needs (VERDICT round-1: converging on the last permitted
    # iteration is one seed away from a failed headline)
    solver = rails_tpu.LyapunovSolver(
        aop, b, rails_tpu.DiagonalOperator(md),
        tol=1e-4, dtype=dtype, expand=6,
        restart_size=120, reduced_size=60, maxit=200)

    def run():
        t0 = time.perf_counter()
        _, _, info = solver.solve(compiled=True)
        return time.perf_counter() - t0, info

    print("solve: compiling + first run...", file=sys.stderr, flush=True)
    warm, info = run()
    # partial line first: a phase timeout during the steady-state rerun
    # must not erase the converged first run (tunnel slow spells took
    # this phase past its cap once in r03)
    out = {
        "solve_n": n, "solve_compile_wall_s": warm,
        "solve_iters": info.iter, "solve_converged": bool(info.converged),
        "solve_res": info.res, "solve_maxit": 200,
        "solve_iter_margin": (200 - info.iter) / 200,
    }
    print(json.dumps(out), flush=True)
    print("solve: steady state...", file=sys.stderr, flush=True)
    wall, info = run()
    out.update({"solve_wall_s": wall, "solve_iters": info.iter,
                "solve_res": info.res})
    print(json.dumps(out))


def _steady_drop(n, n_drop_frac=0.25, chunk=8):
    """Leading entries to exclude from a cumulative wall vector: at
    least the whole first timevec chunk PLUS one entry.  Compile cost
    lands inside the first chunk and the per-iteration timevec is
    interpolated between chunk marks, so any entry before the second
    mark carries smeared compile time - a fraction-only drop left a
    short refined stage's fresh-compile wall inside its 'steady' tail
    and inflated acc_overhead_x to 8.6x on a cold-cache run (round-5
    measurement; warm runs gave 2.3-2.8)."""
    return max(1, int(n * n_drop_frac), min(chunk + 1, n - 2))


def _steady_rate(timevec, n_drop_frac=0.25):
    """Steady-state seconds per RECORDED iteration from a cumulative
    wall vector, excluding the leading entries (see _steady_drop).
    Note SolveInfo.timevec is recvec-filtered (the iteration after a
    restart is unrecorded), so this is per recorded entry, not per
    info.iter iteration - use ``_steady_wall`` for whole-solve
    comparisons (round-5 review finding: multiplying this rate by
    info.iter inflates restart-heavy solves by their restart
    fraction)."""
    import numpy as np

    tv = np.asarray(timevec, dtype=float)
    n = len(tv)
    if n < 4:
        return tv[-1] / max(n, 1) if n else 0.0
    k0 = _steady_drop(n, n_drop_frac)
    return float((tv[-1] - tv[k0]) / (n - 1 - k0))


def _steady_wall(timevec, n_drop_frac=0.25):
    """Compile-separated whole-solve wall: the steady tail rate of the
    cumulative wall vector extrapolated over the full recorded span.
    Entry counts cancel, so the recvec filtering (restart iterations
    unrecorded) introduces no bias - the elapsed time of unrecorded
    iterations is inside the cumulative entries either way.  Gives the
    acc_overhead headline its reproducibility (VERDICT r04 weak 3: the
    raw wall ratio flapped 0.62 <-> 1.53 on tunnel-compile noise)."""
    import numpy as np

    tv = np.asarray(timevec, dtype=float)
    n = len(tv)
    if n < 4:
        return float(tv[-1]) if n else 0.0
    k0 = _steady_drop(n, n_drop_frac)
    rate = (tv[-1] - tv[k0]) / (n - 1 - k0)
    return float(rate * (n - 1))


def phase_accuracy() -> None:
    """The BASELINE 1e-8 target on TPU float32 via residual-corrected
    solves (rails_tpu.refine): reference-suite-style stable tridiagonal
    problem, f32 storage end to end, f64 verification on the host
    against the composed factors."""
    import numpy as np
    import scipy.sparse as sp

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    import rails_tpu
    from rails_tpu.sparse.formats import sparse_from_scipy

    dtype = jnp.float32
    # 8192 (was 16384 in r02, which never landed inside the driver
    # budget): still 5x the reference's real problem, halves compile +
    # host-verification cost (VERDICT r02 item 3)
    n = 8192 if on_tpu else 1024
    rng = np.random.default_rng(0)
    q = lambda x: np.round(x * 1024) / 1024  # exactly f32-representable
    main = q(-2.0 - rng.uniform(0, 1, n))
    up = q(0.4 * rng.uniform(-1, 1, n - 1))
    lo = q(0.4 * rng.uniform(-1, 1, n - 1))
    a_sp = sp.diags([lo, main, up], [-1, 0, 1]).tocsr()
    b32 = np.asarray(rng.uniform(-1, 1, (n, 4)), np.float32)
    # is_hurwitz: diagonally dominant negative by construction -> the
    # projected solve takes the sign path (~0.4 ms) instead of the
    # TPU-serial QR-iteration Schur fallback, which at this phase's
    # capacity (kb ~ 420) cost ~0.7 s EVERY iteration and made the
    # single f32 solve run 300-457 s (see dense_lyap.lyap docstring)
    aop = sparse_from_scipy(a_sp, fmt="dia", dtype=dtype, is_hurwitz=True)

    def true_rel(v, t):
        """||A X + X A' + B B'||_2 / ||B'B||_2 in f64 on the host via
        power iteration on the factored residual (no dense n x n)."""
        v64 = np.asarray(v, np.float64)
        t64 = np.asarray(t, np.float64)
        b64 = b32.astype(np.float64)
        av = a_sp @ v64

        def r_apply(x):
            y = b64 @ (b64.T @ x)
            y += av @ (t64 @ (v64.T @ x))
            y += v64 @ (t64 @ (av.T @ x))
            return y

        x = rng.standard_normal((n, 1))
        x /= np.linalg.norm(x)
        lam = 0.0
        for _ in range(200):
            y = r_apply(x)
            lam = float(np.linalg.norm(y))
            if lam == 0.0:
                break
            x = y / lam
        r0 = np.linalg.norm(b64.T @ b64, 2)
        return lam / r0

    # heartbeat BEFORE the first solve: r03's driver run emitted zero
    # accuracy fields because the first partial line came only after the
    # single f32 solve (226s best case on this tunnel) and the phase cap
    # hit first.  This line records the phase geometry immediately.
    print(json.dumps({"acc_n": n, "acc_tol": 1e-8,
                      "acc_heartbeat": "setup complete, solving"}),
          flush=True)
    # single f32 solve (the floor) vs refined (the target)
    print("accuracy: single f32 solve...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()

    def heartbeat(it, wall, res):
        # one JSON line per timevec_chunk sync: a tunnel slow-spell past
        # the phase cap still leaves the latest estimated residual and
        # iteration count on record
        print(json.dumps({"acc_n": n, "acc_tol": 1e-8,
                          "acc_heartbeat_iter": it,
                          "acc_heartbeat_wall_s": round(wall, 1),
                          "acc_heartbeat_res_est": res}), flush=True)

    v1, t1, info1 = rails_tpu.solve(
        aop, jnp.asarray(b32), tol=1e-8, dtype=dtype, maxit=100, expand=4,
        compiled=True, progress=heartbeat)
    wall_single = time.perf_counter() - t0
    single_true = true_rel(v1, t1)
    # partial line: keep the f32 floor on record even if the refined
    # stage runs past the phase cap
    print(json.dumps({
        "acc_n": n, "acc_tol": 1e-8,
        "acc_single_res_est": float(info1.res),
        "acc_single_res_true": single_true,
        "acc_single_wall_s": wall_single,
    }), flush=True)
    print("accuracy: refined solve...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    # compensated reductions keep the residual estimator honest at this
    # m (plain f32 Lanczos scalars carry ~sqrt(m)*eps noise); they ride
    # the EFT kernels and are ~free on the HBM-bound skinny ops
    v2, t2, info2 = rails_tpu.solve_refined(
        aop, jnp.asarray(b32), tol=1e-8, dtype=dtype, maxit=100, expand=4,
        precision="compensated", compiled=True, progress=heartbeat)
    wall_refined = time.perf_counter() - t0
    refined_true = true_rel(v2, t2)
    # acc_overhead_x: compile-separated (VERDICT r04 next-round item 7).
    # Both sides are steady-tail walls extrapolated over the whole
    # solve (leading quarter - compile + first dispatch - excluded);
    # the raw wall ratio is kept as acc_overhead_wall_x.
    rate1 = _steady_rate(info1.timevec)
    steady_single = _steady_wall(info1.timevec)
    steady_refined = sum(_steady_wall(s.timevec) for s in info2.stages)
    print(json.dumps({
        "acc_n": n, "acc_tol": 1e-8,
        "acc_single_res_est": float(info1.res),
        "acc_single_res_true": single_true,
        "acc_single_wall_s": wall_single,
        "acc_refined_res_est": float(info2.res),
        "acc_refined_res_true": refined_true,
        "acc_refined_converged": bool(info2.converged),
        "acc_refined_stages": len(info2.stages),
        "acc_refined_iters": info2.iter,
        "acc_refined_wall_s": wall_refined,
        "acc_single_steady_s_per_iter": rate1,
        "acc_overhead_x": steady_refined / max(steady_single, 1e-9),
        "acc_overhead_wall_x": wall_refined / max(wall_single, 1e-9),
        "acc_target_met": bool(refined_true <= 1.1e-8),
    }))


def phase_continuation() -> None:
    """BASELINE configs #5: a 3-step Jacobian continuation sequence at
    the phase_solve geometry (n=4096 generalized Laplacian), warm
    starting each step from the previous converged subspace via
    ContinuationSolver.  Records cold vs warm iteration counts and wall
    - the production-scale proof of the restart_data machinery
    (/root/reference/matlab/RAILSsolver.m:174-197).  Geometry and solver
    options match phase_solve exactly so the persistent compile cache
    is shared."""
    import numpy as np
    import scipy.sparse as sp

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    import rails_tpu
    from rails_tpu.continuation import ContinuationSolver
    from rails_tpu.sparse.formats import sparse_from_scipy

    dtype = jnp.float32 if on_tpu else jnp.float64
    n = 4096 if on_tpu else 1024
    side = int(np.sqrt(n))
    rng = np.random.default_rng(0)
    md = jnp.asarray(rng.uniform(0.5, 1.5, n), dtype=dtype)
    b = jnp.asarray(rng.uniform(0, 1, (n, 8)), dtype=dtype)

    def jac(theta):
        # continuation parameter perturbs the diagonal (a reaction-term
        # sweep): same sparsity, nearby spectrum - the regime the warm
        # start is designed for
        lap = sp.kron(sp.eye(side),
                      sp.diags([1.0, -4.0 - theta, 1.0], [-1, 0, 1],
                               (side, side))) \
            + sp.kron(sp.diags([1.0, 1.0], [-1, 1], (side, side)),
                      sp.eye(side))
        return sparse_from_scipy(lap.tocsr(), fmt="dia", dtype=dtype,
                                 is_symmetric=True)

    cont = ContinuationSolver(
        b, rails_tpu.DiagonalOperator(md),
        tol=1e-4, dtype=dtype, expand=6,
        restart_size=120, reduced_size=60, maxit=200)
    out = {"cont_n": n, "cont_steps": [], "cont_thetas": [0.0, 0.05, 0.1]}
    for i, theta in enumerate(out["cont_thetas"]):
        print(f"continuation: step {i} (theta={theta})...",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        _, _, info = cont.step(jac(theta), compiled=True)
        out["cont_steps"].append({
            "theta": theta, "wall_s": time.perf_counter() - t0,
            "iters": int(info.iter), "converged": bool(info.converged),
            "res": float(info.res)})
        print(json.dumps(out), flush=True)  # survive a phase cap
    cold = out["cont_steps"][0]["iters"]
    warm = [s["iters"] for s in out["cont_steps"][1:]]
    out["cont_cold_iters"] = cold
    out["cont_warm_iters_mean"] = sum(warm) / len(warm)
    out["cont_warm_speedup_iters"] = cold / max(min(warm), 1)
    # wall speedup - the metric warm starts must win (VERDICT r04 item
    # 2): cold wall over the mean warm wall.  Round-5 design: the warm
    # basis is pre-truncated to reduced_size (stable k0 -> shared
    # engine bucket across warm steps) and enters marked orthonormal
    # (skipping the O(k0^2) per-column host re-orthonormalization that
    # dominated the round-4 warm walls).
    cold_wall = out["cont_steps"][0]["wall_s"]
    warm_walls = [s["wall_s"] for s in out["cont_steps"][1:]]
    out["cont_cold_wall_s"] = cold_wall
    out["cont_warm_wall_mean_s"] = sum(warm_walls) / len(warm_walls)
    out["cont_warm_speedup_wall"] = cold_wall / max(
        out["cont_warm_wall_mean_s"], 1e-9)
    print(json.dumps(out))


def phase_hub() -> None:
    """Power-law sparsity (VERDICT r04 item 5): hub-split operator vs
    the XLA take fallback on a superhub-with-locality matrix - banded
    bulk (the windowizable class) plus high-degree hub rows/columns
    spanning the whole index space (which alone kill the windowed
    kernel: without the split the whole matrix runs at take speed).
    Pure Barabasi-Albert, where NO VMEM-window split can pay, is the
    recorded probe benchmarks/probes/PROBE_hub_ba.json."""
    import numpy as np
    import scipy.sparse as sp

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    from rails_tpu.sparse.hub import hub_operator

    dtype = jnp.float32 if on_tpu else jnp.float64
    m, ell_l, band = (1 << 19 if on_tpu else 1 << 13), 8, 64
    n_hubs, hub_deg = 64, (4096 if on_tpu else 512)
    rng = np.random.default_rng(0)
    base = np.arange(m)
    idx = np.clip(base[:, None] + rng.integers(-band, band + 1, (m, ell_l)),
                  0, m - 1)
    val = rng.uniform(-1, 1, (m, ell_l)) * 0.2
    rows = np.repeat(base, ell_l)
    cols = idx.ravel()
    vals = val.ravel()
    hubs = rng.choice(m, n_hubs, replace=False)
    h_rows, h_cols, h_vals = [], [], []
    for hb in hubs:
        c = rng.choice(m, hub_deg, replace=False)
        v = rng.uniform(-1, 1, hub_deg) * 0.1
        h_rows.append(np.full(hub_deg, hb)); h_cols.append(c)
        h_vals.append(v)
        # symmetric partners (hub columns)
        h_rows.append(c); h_cols.append(np.full(hub_deg, hb))
        h_vals.append(v * 0.5)
    a = sp.coo_matrix(
        (np.concatenate([vals] + h_vals),
         (np.concatenate([rows] + h_rows),
          np.concatenate([cols] + h_cols))), shape=(m, m)).tocsr()
    nnz = int(a.nnz)
    s = 16
    x = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=dtype)
    total = jax.jit(lambda z: jnp.sum(jnp.abs(z)))

    out = {"hub_m": m, "hub_nnz": nnz, "hub_count": n_hubs,
           "hub_deg": hub_deg, "device": dev_kind}
    op = hub_operator(a, max_hubs=n_hubs, degree_factor=8.0,
                      dtype=dtype)
    out["hub_rest_windowed"] = op.rest.well is not None
    # correctness on the live payloads
    y = np.asarray(op.matmat(x), np.float64)
    ref = a @ np.asarray(x, np.float64)
    out["hub_rel_err"] = float(
        np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30))
    print(json.dumps(out), flush=True)

    import functools

    # operator rides as a jit ARGUMENT (closure constants would ship
    # the payload in the compile request body - HTTP 413 on the tunnel)
    hub_jit = jax.jit(lambda o, z: o.matmat(z))
    hub_fn = functools.partial(hub_jit, op)
    print("hub: timing split...", file=sys.stderr, flush=True)
    float(total(hub_fn(x)))
    lo, hi = (10, 40) if on_tpu else (2, 8)
    dt_h = _chain_time(hub_fn, x, total, lo, hi)
    out["hub_spmm_nnz_per_s"] = nnz / dt_h
    print(json.dumps(out), flush=True)

    # the fallback this matrix class would otherwise get: plain ELL
    # pads every row to the hub degree (~8 GB here - itself infeasible),
    # so the honest general-sparsity XLA baseline is the COO
    # gather + segment-sum apply (nnz-proportional memory, the
    # reference's CrsMatrix::Apply shape)
    coo = a.tocoo()
    cols_j = jnp.asarray(coo.col.astype(np.int32))
    rows_j = jnp.asarray(coo.row.astype(np.int32))
    vals_j = jnp.asarray(coo.data, dtype=dtype)

    xla_jit = jax.jit(lambda c, r, v, z: jax.ops.segment_sum(
        v[:, None] * z[c], r, num_segments=m))
    xla_fn = functools.partial(xla_jit, cols_j, rows_j, vals_j)
    out["hub_baseline"] = "coo gather + segment_sum (nnz-proportional)"
    print("hub: timing take path...", file=sys.stderr, flush=True)
    y_b = np.asarray(xla_fn(x), np.float64)
    out["hub_baseline_rel_err"] = float(
        np.abs(y_b - ref).max() / max(np.abs(ref).max(), 1e-30))
    dt_x = _chain_time(xla_fn, x, total, 2, 4)
    out["hub_xla_nnz_per_s"] = nnz / dt_x
    out["hub_speedup_vs_xla"] = dt_x / dt_h
    print(json.dumps(out))


def phase_scale() -> None:
    """Production-scale refined solve INSIDE the official bench
    (VERDICT r04 next-round item 6: SCALE_r04 lived in a standalone
    probe artifact).  n=65536 generalized 2D-Laplacian, f32 storage,
    staged defect correction - the configuration the round-4 probes
    proved necessary (plain f32 plateaus at its projected-solve floor)
    and sufficient (converges to ~1e-4 true).  Geometry uses the small
    restart ladder (restart_size 160) whose steady per-iteration cost
    measured 11 ms (SCALE_r04 per_iteration_steady_ms) so the phase
    fits a driver budget slice; heartbeat JSON lines land partial
    fields even under a phase cap."""
    import numpy as np
    import scipy.sparse as sp

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    import rails_tpu
    from rails_tpu.sparse.formats import sparse_from_scipy

    dtype = jnp.float32
    side = 256 if on_tpu else 32
    n = side * side
    rng = np.random.default_rng(0)
    lap = sp.kron(sp.eye(side),
                  sp.diags([1.0, -4.0, 1.0], [-1, 0, 1], (side, side))) \
        + sp.kron(sp.diags([1.0, 1.0], [-1, 1], (side, side)), sp.eye(side))
    aop = sparse_from_scipy(lap.tocsr(), fmt="dia", dtype=dtype,
                            is_symmetric=True)
    md = jnp.asarray(rng.uniform(0.5, 1.5, n), dtype=dtype)
    mop = rails_tpu.DiagonalOperator(md)
    b32 = np.asarray(rng.uniform(0, 1, (n, 8)), np.float32)
    tol = 1e-4
    print(json.dumps({"scale_n": n, "scale_tol": tol,
                      "scale_heartbeat": "setup complete, solving"}),
          flush=True)

    def heartbeat(it, wall, res):
        print(json.dumps({"scale_n": n,
                          "scale_heartbeat_iter": it,
                          "scale_heartbeat_wall_s": round(wall, 1),
                          "scale_heartbeat_res_est": res}), flush=True)

    t0 = time.perf_counter()
    v, t, info = rails_tpu.solve_refined(
        aop, jnp.asarray(b32), mop, tol=tol, stage_tol=5e-3,
        dtype=dtype, maxit=1500, expand=8,
        restart_size=160, reduced_size=80, timevec_chunk=50,
        precision="compensated", compiled=True, progress=heartbeat)
    wall = time.perf_counter() - t0
    out = {
        "scale_n": n, "scale_tol": tol,
        "scale_res_est": float(info.res),
        "scale_converged": bool(info.converged),
        "scale_stages": len(info.stages),
        "scale_iters": info.iter,
        "scale_rank": int(v.shape[1]),
        "scale_wall_s": wall,
        # per RECORDED iteration (restart iterations are unrecorded in
        # timevec; ~8% of iterations at this restart ladder)
        "scale_steady_s_per_recorded_iter": _steady_rate(
            info.stages[0].timevec),
    }
    print(json.dumps(out), flush=True)  # before the host verification
    # f64 true residual via factored power iteration (host; few iters -
    # the estimate stabilizes to ~1% in ~40 and this phase only needs
    # the order of magnitude vs tol)
    v64 = np.asarray(v, np.float64)
    t64 = np.asarray(t, np.float64)
    b64 = b32.astype(np.float64)
    md64 = np.asarray(md, np.float64)
    av = lap.tocsr() @ v64
    mv = md64[:, None] * v64

    def r_apply(x):
        y = b64 @ (b64.T @ x)
        y += av @ (t64 @ (mv.T @ x))
        y += mv @ (t64 @ (av.T @ x))
        return y

    x = rng.standard_normal((n, 1))
    x /= np.linalg.norm(x)
    lam = 0.0
    for _ in range(60):
        y = r_apply(x)
        lam = float(np.linalg.norm(y))
        if lam == 0.0:
            break
        x = y / lam
    out["scale_res_true"] = lam / np.linalg.norm(b64.T @ b64, 2)
    out["scale_target_met"] = bool(out["scale_res_true"] <= 2 * tol)
    print(json.dumps(out))


def mesh_scaling_bench():
    """Multi-device halo-SpMM artifact.

    Real multi-chip hardware is not available (1 TPU via tunnel; CPU
    runs use virtual devices oversubscribed onto 2 host cores), so
    throughput-vs-devices timing is NOT a scaling measurement here and
    is labeled as such.  What this phase records instead, and what does
    transfer to a pod:

    - ``comm`` — per-device communication volume of one apply, read out
      of the compiled HLO (collective-permute operand shapes), compared
      with the analytic minimal halo (span_lo+span_hi rows x s columns).
      ratio == 1.0 means the compiled program moves exactly the
      neighbor halo and nothing else, independent of device count - the
      property that gives the reference its parallel efficiency
      (/root/reference/src/Epetra_OperatorWrapper.cpp:75-91).
    - ``halo_overhead_vs_plain`` — time of the mesh path at nd=1 over
      the plain per-chip kernel: proves the shard_map wrapper keeps the
      Pallas kernel's throughput (on TPU) rather than falling back.
    """
    import re

    import numpy as np

    jax, on_tpu, dev_kind, bw = _jax_setup()
    import jax.numpy as jnp

    from rails_tpu.parallel.halo_spmm import halo_dia_spmm
    from rails_tpu.parallel.mesh import make_mesh
    from rails_tpu.sparse.formats import DiaMatrix
    from rails_tpu.sparse.spmm import dia_spmm

    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    nd = len(jax.devices())
    dtype = jnp.float32 if on_tpu else jnp.float64
    itemsize = jnp.dtype(dtype).itemsize
    side = 1536 if on_tpu else 512
    m = (side * side // (nd * 128)) * nd * 128
    s = 16
    offsets = (-side, -1, 0, 1, side)
    span = 2 * side  # span_lo + span_hi
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                       dtype=dtype) * 0.12
    dia = DiaMatrix(data, offsets, (m, m))
    v = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=dtype)
    real_parallel = on_tpu or nd <= (os.cpu_count() or 1)
    results = {"metric": "halo_dia_spmm_nnz_per_s", "unit": "nnz/s",
               "rows": m, "device": dev_kind, "devices": nd,
               "timing_is_scaling": bool(real_parallel and nd > 1),
               "per_devices": {}, "comm": {}}
    nnz = len(offsets) * m
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    analytic = span * s * itemsize
    for nd_i in sorted({1, 2, nd // 2, nd} - {0}):
        if nd_i > nd or m % (nd_i * 128):
            continue
        mesh = make_mesh(nd_i)
        fn = jax.jit(lambda x, mesh=mesh: halo_dia_spmm(dia, x, mesh))
        try:
            compiled = fn.lower(v).compile()
            float(total(fn(v)))
        except ValueError:
            continue  # slab too small for the stencil
        # communication volume: every collective-permute operand in the
        # compiled module, bytes per device per apply
        hlo = compiled.as_text()
        moved = 0
        for shape in re.findall(
                r"=\s*\(?(?:f32|f64|bf16)\[([\d,]*)\][^=\n]*"
                r"collective-permute", hlo):
            dims = [int(d) for d in shape.split(",") if d]
            moved += int(np.prod(dims)) * itemsize if dims else itemsize
        if nd_i > 1:
            results["comm"][str(nd_i)] = {
                "permute_bytes_per_device": moved,
                "analytic_halo_bytes": analytic,
                "ratio": moved / analytic if analytic else 0.0,
            }
        lo, hi = (10, 60) if on_tpu else (2, 10)
        dt = _chain_time(fn, v, total, lo, hi)
        results["per_devices"][str(nd_i)] = nnz / dt
        print(json.dumps(results), flush=True)  # survive a phase cap
    def clamp_overhead(key, ratio):
        # a wrapped path cannot beat the kernel it contains; < 1 is
        # timing noise (VERDICT r03 weak 4) - clamp, keep the raw value
        results[key + "_raw"] = ratio
        results[key] = max(ratio, 1.0)

    base = results["per_devices"].get("1")
    if base:
        plain = jax.jit(lambda x: dia_spmm(dia, x))
        float(total(plain(v)))
        dt_plain = _chain_time(plain, v, total,
                               *((10, 60) if on_tpu else (2, 10)))
        clamp_overhead("halo_overhead_vs_plain", (nnz / base) / dt_plain)
    full = results["per_devices"].get(str(nd))
    results["value"] = full or 0.0
    ratios = [c["ratio"] for c in results["comm"].values()]
    # comm_minimality: 1.0 = the compiled program moves exactly the
    # analytic halo and nothing else.  (Round 2 put this under
    # "vs_baseline", silently repurposing that key away from throughput
    # scaling; renamed per ADVICE r02.  Throughput scaling efficiency
    # still needs a real pod and is emitted as scaling_efficiency when
    # the devices are physical.)  With a single device there is no
    # collective to audit: emit null, not 0.0 (VERDICT r03 weak 5 - a
    # zero reads as "no minimality" instead of "not measurable").
    results["comm_minimality"] = (
        min(min(analytic / c["permute_bytes_per_device"], 1.0)
            for c in results["comm"].values())
        if ratios and all(r > 0 for r in ratios) else None)
    if not results["comm"]:
        results["comm"] = None
    if real_parallel and base and full and nd > 1:
        results["scaling_efficiency"] = full / (base * nd)
    print(json.dumps(results), flush=True)

    # distributed-ELL wrapper overhead at the current device count
    # (VERDICT r03 next-round item 4): halo_ell_spmm (shard_map + halo
    # permutes + extended-operand kernel) vs the bare per-chip kernel on
    # the same payload.  The DIA analog (halo_overhead_vs_plain, 1.06x
    # on TPU, commit 845ff37) had no ELL counterpart on record.
    try:
        import scipy.sparse as sp

        from rails_tpu.parallel.halo_ell import (build_halo_ell,
                                                 halo_ell_spmm)
        from rails_tpu.sparse.ell_spmm import ell_spmm_t
        from rails_tpu.sparse.formats import sparse_from_scipy

        m_e, ell_l, band = (1 << 20 if on_tpu else 1 << 14), 8, 64
        base_r = np.arange(m_e)
        idx = np.clip(base_r[:, None]
                      + rng.integers(-band, band + 1, (m_e, ell_l)),
                      0, m_e - 1)
        val = rng.uniform(-1, 1, (m_e, ell_l)) * 0.2
        a_e = sp.coo_matrix(
            (val.ravel(), (np.repeat(base_r, ell_l), idx.ravel())),
            shape=(m_e, m_e)).tocsr()
        op_e = sparse_from_scipy(a_e, fmt="ell", dtype=dtype)
        mesh1 = make_mesh(nd)
        p = build_halo_ell(op_e.fwd, mesh1)
        if p is not None and op_e.fwd.well is not None:
            x_e = jnp.asarray(rng.uniform(-1, 1, (m_e, s)), dtype=dtype)
            use_k = bool(on_tpu)
            halo_fn = jax.jit(
                lambda x: halo_ell_spmm(p, x, mesh1, use_kernel=use_k))
            if nd > 1:
                # ELL comm audit (mirrors the DIA one above): the
                # compiled program should ppermute exactly the
                # (halo_lo + halo_hi) x s neighbor rows per device
                hlo_e = halo_fn.lower(x_e).compile().as_text()
                moved_e = 0
                for shape in re.findall(
                        r"=\s*\(?(?:f32|f64|bf16)\[([\d,]*)\][^=\n]*"
                        r"collective-permute", hlo_e):
                    dims = [int(x) for x in shape.split(",") if x]
                    moved_e += (int(np.prod(dims)) * itemsize
                                if dims else itemsize)
                analytic_e = (p.halo_lo + p.halo_hi) * s * itemsize
                results["ell_comm"] = {
                    "permute_bytes_per_device": moved_e,
                    "analytic_halo_bytes": analytic_e,
                    "ratio": moved_e / analytic_e if analytic_e else None,
                }
                results["ell_comm_minimality"] = (
                    min(analytic_e / moved_e, 1.0) if moved_e else None)
            float(total(halo_fn(x_e)))
            dt_h = _chain_time(halo_fn, x_e, total,
                               *((10, 60) if on_tpu else (2, 10)))
            if use_k:
                xt_e = jnp.asarray(x_e.T)
                bare_fn = jax.jit(
                    lambda x: ell_spmm_t(op_e.fwd.well, x))
                tot_t = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
                float(tot_t(bare_fn(xt_e)))
                dt_b = _chain_time(bare_fn, xt_e, tot_t, 10, 60)
            else:
                bare_fn = jax.jit(lambda x: op_e.fwd.matmat(x))
                float(total(bare_fn(x_e)))
                dt_b = _chain_time(bare_fn, x_e, total, 2, 10)
            results["ell_halo_devices"] = nd
            if on_tpu:
                clamp_overhead("ell_halo_overhead_vs_plain", dt_h / dt_b)
            else:
                # CPU compares jnp-emulation vs XLA take - different
                # code, no containment relation, no clamp
                results["ell_halo_overhead_vs_plain"] = dt_h / dt_b
                results["ell_halo_overhead_note"] = (
                    "CPU-only figure: compares the jnp-EMULATED windowed"
                    " halo schedule (the kernel's schedule without the "
                    "kernel) against the XLA take path - different code,"
                    " no containment relation.  NOT the distributed-ELL "
                    "cost on TPU, where the same wrapper over the real "
                    "Pallas kernel measures ~1.0x the bare kernel "
                    "(ell_halo_overhead_vs_plain in the TPU BENCH "
                    "artifact, nd=1)")
            results["ell_halo_nnz_per_s"] = int(a_e.nnz) / dt_h
    except Exception as e:  # noqa: BLE001 - optional datum
        results["ell_halo_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(results))


# Compact headline (VERDICT r04 weak 1 / next-round item 3): the
# consolidated line outgrew the driver's 2,000-char tail window in r04
# and stopped parsing.  The orchestrator prints the FULL line first,
# then this compact (< ~1,500 chars) headline line LAST - the parser
# takes the last JSON line, so the machine-readable channel stays
# intact while the full record rides just above it.
COMPACT_KEYS = (
    "metric", "value", "unit", "vs_baseline", "vs_stream",
    "timing_suspect", "spmm_impl", "kernel_gbs", "stream_gbs",
    "spmm_wrapper_overhead",
    "acc_single_res_true", "acc_refined_res_true", "acc_target_met",
    "acc_overhead_x", "acc_refined_wall_s",
    "ell_spmm_nnz_per_s", "ell_vs_xla", "ell_vs_gather_ceiling",
    "hub_speedup_vs_xla", "hub_spmm_nnz_per_s",
    "moc_res_fro", "moc_iters", "moc_converged",
    "solve_wall_s", "solve_iters", "solve_converged",
    "cont_cold_iters", "cont_warm_iters_mean",
    "cont_warm_speedup_iters", "cont_warm_speedup_wall",
    "scale_n", "scale_res_true", "scale_converged", "scale_wall_s",
    "mesh_comm_minimality", "ell_comm_minimality",
    "mesh_halo_overhead_vs_plain", "ell_halo_overhead_vs_plain",
)
COMPACT_LIMIT = 1500


def build_compact_line(out) -> str:
    """The final-stdout-line headline: guaranteed under COMPACT_LIMIT
    chars (floats at 6 significant digits; drops its trailing sections
    if ever needed)."""
    def r6(v):
        if isinstance(v, float):
            return float(f"{v:.6g}")
        return v

    compact = {k: r6(out[k]) for k in COMPACT_KEYS if k in out}
    compact["phase_walls"] = {
        k: r6(v.get("wall_s")) for k, v in out.get("phases", {}).items()}
    errs = {k: v["error"][:60] for k, v in out.get("phases", {}).items()
            if "error" in v}
    if errs:
        compact["phase_errors"] = errs
    compact["provenance"] = (
        "compact headline of the full consolidated line directly "
        "above (same single orchestrated run)")
    line = json.dumps(compact)
    if len(line) > COMPACT_LIMIT:  # defensive: the headline must parse
        for k in ("provenance", "phase_errors", "phase_walls"):
            compact.pop(k, None)
            line = json.dumps(compact)
            if len(line) <= COMPACT_LIMIT:
                break
    return line


def _extract_json(text):
    """Last parseable JSON line of a phase's stdout (phases may print
    intermediate lines; the final full dict wins)."""
    for line in reversed((text or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run_phase(args, timeout):
    """Run one phase subprocess.  Returns (result_dict_or_None, meta):
    meta records wall time and, on failure, the error kind plus the last
    stderr lines - a timed-out phase still yields any intermediate JSON
    it printed before the kill."""
    if "--cpu" in sys.argv and "--cpu" not in args:
        args = args + ["--cpu"]
    meta = {}
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        meta["wall_s"] = round(time.monotonic() - t0, 1)
        if proc.returncode != 0:
            meta["error"] = f"rc={proc.returncode}: " + "; ".join(
                proc.stderr.strip().splitlines()[-3:])[:500]
        return _extract_json(proc.stdout), meta
    except subprocess.TimeoutExpired as e:
        meta["wall_s"] = round(time.monotonic() - t0, 1)
        meta["error"] = f"timeout after {timeout:.0f}s"
        stdout = e.stdout
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
        return _extract_json(stdout), meta
    except Exception as e:  # noqa: BLE001 - record, never drop the round
        meta["wall_s"] = round(time.monotonic() - t0, 1)
        meta["error"] = f"{type(e).__name__}: {e}"[:500]
        return None, meta


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
        if phase == "accuracy":
            return phase_accuracy()
        if phase == "ell":
            return phase_ell()
        if phase == "continuation":
            return phase_continuation()
        if phase == "scale":
            return phase_scale()
        if phase == "hub":
            return phase_hub()
        raise SystemExit(f"unknown phase {phase}")

    # Orchestrate phases in subprocesses (tunnel-wedge isolation),
    # most-important-first, under a total budget; print the cumulative
    # consolidated line after every phase so nothing is ever lost.
    #
    # Budget arithmetic (VERDICT r03 weak 1 / next-round item 1): static
    # caps alone sum past the budget, so r03's accuracy+ell timeouts
    # starved solve (71 s) and skipped mesh entirely.  Each phase's cap
    # is now min(static_cap, remaining - sum(reserves of later phases)):
    # no phase can eat another's minimum slice, and a phase that needs
    # less than its reserve hands the slack down the list.
    budget = float(os.environ.get("RAILS_BENCH_BUDGET_S", 1380))
    deadline = time.monotonic() + budget
    out = {"metric": "dia_spmm_nnz_per_s", "value": 0.0, "unit": "nnz/s",
           "vs_baseline": 0.0, "phases": {},
           "provenance": ("single orchestrated `python bench.py` run; "
                          "every field below comes from this run's own "
                          "phase subprocesses (per-phase wall times in "
                          "'phases'), budget "
                          f"{budget:.0f}s")}
    print(json.dumps(out), flush=True)  # never leave an empty tail

    def emit():
        print(json.dumps(out), flush=True)
        print(build_compact_line(out), flush=True)

    # (static_cap, reserve) per phase, in run order.  Reserves are the
    # floor a later phase is guaranteed; statics are the ceiling any
    # phase may take while others still wait.
    # continuation static cap 300: the phase ran 169-238 s across r04
    # tunnels (three n=4096 solves; the warm engine recompiles once per
    # distinct space width) - 240 left no tunnel-noise margin
    # spmm_xla (the fallback when the pallas phase fails) sits in the
    # plan with reserve 0 so IT still honors the reserves of everything
    # after it - otherwise a failed pallas phase would hand the
    # fallback an unreserved cap and re-open the starvation hole
    # scale sits between continuation and mesh: important enough for a
    # reserve (VERDICT r04 item 6 wants it IN the driver artifact), but
    # after the phases whose headline numbers anchor every round
    plan = {"spmm": (480, 0), "spmm_xla": (300, 0),
            "accuracy": (480, 180), "ell": (600, 150),
            "hub": (240, 60), "solve": (360, 100),
            "continuation": (300, 70), "scale": (420, 100),
            "mesh": (300, 80)}
    order = list(plan)

    def run(name, args, merge=None):
        later = order[order.index(name) + 1:] if name in order else []
        reserve_later = sum(plan[p][1] for p in later)
        remaining = deadline - time.monotonic()
        cap = min(plan[name][0] if name in plan else 300,
                  remaining - reserve_later)
        if cap < 45:
            out["phases"][name] = {"error": "skipped (budget exhausted)"}
            emit()
            return None
        res, meta = _run_phase(args, cap)
        out["phases"][name] = meta
        if res:
            if merge:
                merge(res)
            else:
                out.update(res)
        emit()
        return res

    spmm = run("spmm", ["--phase", "spmm", "--impl", "pallas"])
    if spmm is None:
        run("spmm_xla", ["--phase", "spmm", "--impl", "xla"])
    run("accuracy", ["--phase", "accuracy"])
    # ell cap 600: the phase holds three compiles (kernel, gather probe,
    # XLA take path), the 16.8M-nnz host build, and the MOC end-to-end
    # solve; it ran 240-480s across r03 tunnels and once hit the old
    # 480s cap (partial results still landed via incremental emit)
    run("ell",
        ["--phase", "ell"],
        merge=lambda r: out.update(
            {k: v for k, v in r.items() if k != "device"}))
    run("hub",
        ["--phase", "hub"],
        merge=lambda r: out.update(
            {k: v for k, v in r.items() if k != "device"}))

    def merge_mesh(r):
        out["mesh_halo_overhead_vs_plain"] = r.get("halo_overhead_vs_plain")
        if "halo_overhead_vs_plain_raw" in r:
            out["mesh_halo_overhead_vs_plain_raw"] = \
                r["halo_overhead_vs_plain_raw"]
        out["mesh_devices"] = r.get("devices")
        out["mesh_comm"] = r.get("comm")
        out["mesh_comm_minimality"] = r.get("comm_minimality")
        for k in ("ell_halo_devices", "ell_halo_overhead_vs_plain",
                  "ell_halo_overhead_vs_plain_raw", "ell_halo_nnz_per_s",
                  "ell_halo_error", "ell_comm", "ell_comm_minimality"):
            if k in r:
                out[k] = r[k]

    run("solve", ["--phase", "solve"])
    run("continuation", ["--phase", "continuation"])
    run("scale", ["--phase", "scale"])
    run("mesh", ["--mesh"], merge=merge_mesh)


if __name__ == "__main__":
    main()
