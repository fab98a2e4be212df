"""Command-line driver - the reference's MPI driver (src/main.cpp)
re-imagined for single-controller JAX.

Usage:
    python -m rails_tpu.cli [--params params.xml|json] [--platform cpu|tpu]
                            [--only-eigenvalues] [directory]

Reads A.mtx / B.mtx / M.mtx from the directory (main.cpp:62-72), builds
the Schur reduction for the singular mass matrix (main.cpp:78-88), solves
the Lyapunov equation (main.cpp:118), checkpoints V.mtx / T.mtx
(main.cpp:123-126; reloadable with --only-eigenvalues, :128-138), then
computes the dominant eigenpairs of the full-space solution operator and
the trace-normalized spectrum table (main.cpp:140-170), and dumps the
profiler (main.cpp:172-173).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="rails-tpu",
        description="TPU-native low-rank Lyapunov solver (RAILS equivalent)")
    ap.add_argument("directory", nargs="?", default=".",
                    help="directory with A.mtx, B.mtx, M.mtx")
    ap.add_argument("--params", help="XML (Teuchos) or JSON parameter file")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu)")
    ap.add_argument("--only-eigenvalues", action="store_true",
                    help="skip the solve; reload V.mtx/T.mtx")
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--maxit", type=int, default=None)
    ap.add_argument("--num-eigenvalues", type=int, default=None)
    ap.add_argument("--x64", action="store_true",
                    help="enable float64 (CPU)")
    ap.add_argument("--reorder", choices=["none", "rcm"], default="none",
                    help="symmetric bandwidth-reduction reordering before "
                         "the solve (DIA-kernel friendly; deterministic, "
                         "so --only-eigenvalues reloads stay consistent)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import rails_tpu
    from rails_tpu import io as rio
    from rails_tpu.config import (
        ParameterList,
        load_json_parameters,
        load_xml_parameters,
        solver_options_from_params,
    )
    from rails_tpu.eigs import eigs
    from rails_tpu.schur import schur_reduce
    from rails_tpu.timer import enable_profiling, save_profiles, timer

    enable_profiling()
    params = ParameterList()
    if args.params:
        loader = load_xml_parameters if args.params.endswith(".xml") \
            else load_json_parameters
        params = loader(args.params)

    d = args.directory
    print("Loading matrices")
    with timer("Driver", "load"):
        a = rio.read_matrix_market(os.path.join(d, "A.mtx"))
        b = rio.read_matrix_market(os.path.join(d, "B.mtx"))
        m = rio.read_matrix_market(os.path.join(d, "M.mtx"))

    if args.reorder == "rcm":
        from rails_tpu.sparse.reorder import (
            bandwidth, permute_system, rcm_permutation)

        bw0 = bandwidth(a)
        perm = rcm_permutation(a)
        a, m, b = permute_system(a, m, b, perm)
        print(f"RCM reordering: bandwidth {bw0} -> {bandwidth(a)}")

    print("Computing Schur complement")
    with timer("Driver", "schur"):
        red = schur_reduce(a, m, b)

    overrides = {}
    if args.tol is not None:
        overrides["tol"] = args.tol
    if args.maxit is not None:
        overrides["maxit"] = args.maxit
    opts = solver_options_from_params(
        params.sublist("Lyapunov Solver"), **overrides)

    v_path = os.path.join(d, "V.mtx")
    t_path = os.path.join(d, "T.mtx")
    if not args.only_eigenvalues:
        print("Creating solver")
        solver = rails_tpu.LyapunovSolver(
            red.operator, jnp.asarray(red.bs), red.ms, options=opts)
        print("Performing solve")
        print(f"Amount of matrix-vector products before the solve: "
              f"{red.mvps}")
        v, t, info = solver.solve()
        print(f"Amount of matrix-vector products after the solve: "
              f"{info.mvps}")
        outcome = "converged" if info.converged else "did not converge"
        print(f"Solver {outcome} in {info.iter} iterations, "
              f"relative residual {info.res:.3e}, space size {v.shape[1]}")
        with timer("Driver", "checkpoint"):
            rio.write_matrix_market(v_path, np.asarray(v))
            rio.write_matrix_market(t_path, np.asarray(t))
    else:
        print("Reloading V.mtx / T.mtx")
        v = jnp.asarray(rio.read_matrix_market(v_path))
        t = jnp.asarray(rio.read_matrix_market(t_path))

    eig_params = params.sublist("Eigenvalue Solver")
    num = args.num_eigenvalues or int(
        eig_params.get("Number of Eigenvalues", 10))

    print("Computing eigenvalues of the solution operator")
    with timer("Driver", "eigenvalues"):
        sop = red.solution_operator(v, t)
        # Anasazi BlockKrylovSchurSolMgr parameter names pass through
        # (the reference forwards the whole "Eigenvalue Solver" sublist,
        # /root/reference/src/Epetra_OperatorWrapper.cpp:163-186)
        bsz = int(eig_params.get("Block Size", 1))
        nblocks = eig_params.get("Num Blocks")  # subspace = bsz * blocks
        evals, _ = eigs(
            sop, num=num,
            tol=float(eig_params.get("Convergence Tolerance", 1e-6)),
            block_size=bsz,
            max_restarts=int(eig_params.get("Maximum Restarts", 100)),
            subspace=None if nblocks is None else bsz * int(nblocks))

    with timer("Driver", "trace"):
        trace = float(red.trace(v, t))

    print(f"{'eigenvalue':>20}{'eigenvalue/trace':>20}")
    for lam in np.asarray(evals):
        print(f"{lam:>20.12g}{lam / trace:>20.12g}")

    save_profiles()
    return 0


if __name__ == "__main__":
    sys.exit(main())
