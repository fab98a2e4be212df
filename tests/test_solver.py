"""Core solver tests - mirrors /root/reference/test/LyapunovSolver_test.cpp
(property tests on random stable tridiagonal problems, restart variants,
minimize-space, warm restart) and the 2x2 known-answer Epetra test.

The acceptance criterion is the reference's: the *true* residual
A V T V' + V T V' A' + B B' is elementwise ~ 0 (EXPECT_VECTOR_NEAR with
atol 1e-3, /root/reference/test/TestHelpers.hpp:4-11); we use norm-based
bounds at the same tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import rails_tpu
from rails_tpu import SolverOptions


def tridiagonal_problem(rng, n=20):
    """Random tridiagonal A with amplified diagonal + random rank-1 B
    (get_tridiagonal_problem, LyapunovSolver_test.cpp:181-200)."""
    a = rng.uniform(-1, 1, (n, n))
    a = np.where(np.abs(np.subtract.outer(np.arange(n), np.arange(n))) > 1, 0.0, a)
    a[np.diag_indices(n)] *= 3.0
    b = rng.uniform(-1, 1, (n, 1))
    b[n - 1, 0] = 0.0
    return jnp.asarray(a), jnp.asarray(b)


def true_residual(a, v, t, b, m=None):
    a = np.asarray(a)
    v = np.asarray(v)
    t = np.asarray(t)
    b = np.asarray(b)
    x = v @ t @ v.T
    if m is None:
        r = a @ x + x @ a.T + b @ b.T
    else:
        m = np.asarray(m)
        r = a @ x @ m.T + m @ x @ a.T + b @ b.T
    return np.abs(r).max()


class TestStlSolverMirror:
    def test_basic_solve(self, rng):
        a, b = tridiagonal_problem(rng)
        v, t, info = rails_tpu.solve(a, b, tol=1e-3)
        assert info.converged, info
        assert true_residual(a, v, t, b) < 1e-3

    def test_solve_twice(self, rng):
        # StlSolver solves twice with the same solver object (:149-157)
        a, b = tridiagonal_problem(rng)
        solver = rails_tpu.LyapunovSolver(a, b, tol=1e-3)
        for _ in range(2):
            v, t, info = solver.solve()
            assert info.converged
            assert true_residual(a, v, t, b) < 1e-3

    def test_restart_size(self, rng):
        # StlSolverRestart (:202-232): restart_size 19, reduced 15, expand 1
        n = 20
        a, b = tridiagonal_problem(rng, n)
        v, t, info = rails_tpu.solve(
            a, b, tol=1e-3,
            restart_size=19, reduced_size=15, expand=1,
            restart_upon_convergence=False)
        assert info.converged
        assert v.shape[1] < n
        assert true_residual(a, v, t, b) < 1e-3

    def test_minimize_solution_space(self, rng):
        # StlSolverMinimize (:234-277)
        n = 20
        a, b = tridiagonal_problem(rng, n)
        v1, t1, info1 = rails_tpu.solve(
            a, b, tol=1e-8, restart_upon_convergence=False)
        assert info1.converged
        assert true_residual(a, v1, t1, b) < 1e-3

        v2, t2, info2 = rails_tpu.solve(
            a, b, tol=1e-8, restart_upon_convergence=True)
        assert info2.converged
        assert v2.shape[1] < v1.shape[1] or v2.shape[1] < n
        assert true_residual(a, v2, t2, b) < 1e-3

    def test_restart_iterations(self, rng):
        # StlSolverRestartIterations (:279-310).  Note: on indefinite random
        # draws the subspace iteration may only converge at full space (we
        # verified a faithful replica of the C++ loop behaves identically on
        # such draws); use a Hurwitz-shifted tridiagonal so that low-rank
        # convergence - the property the reference test asserts - is
        # realization-independent.
        n = 20
        a, b = tridiagonal_problem(rng, n)
        a = a - 3.0 * jnp.eye(n)
        v, t, info = rails_tpu.solve(
            a, b, tol=1e-3, restart_iterations=10, expand=1,
            restart_upon_convergence=False)
        assert info.converged
        assert v.shape[1] < n
        # the solver's guarantee is lambda_max(R) < tol * ||B||^2
        thr = 1e-3 * float(np.linalg.norm(np.asarray(b)) ** 2)
        assert true_residual(a, v, t, b) < 1.5 * thr

    def test_restart_from_solution(self, rng):
        # StlSolverRestartFromSolution (:312-352): solve, perturb A, warm start
        n = 20
        a, b = tridiagonal_problem(rng, n)
        v1, t1, info1 = rails_tpu.solve(a, b, tol=1e-8)
        assert info1.converged
        assert v1.shape[1] < n

        a2 = a.at[n - 1, n - 1].set(4.0)
        v2, t2, info2 = rails_tpu.solve(
            a2, b, tol=1e-8, space=v1, restart_upon_convergence=True)
        assert info2.converged
        assert v2.shape[1] < n
        assert true_residual(a2, v2, t2, b) < 1e-3

    def test_warm_restart_data(self, rng):
        # MATLAB restart_data warm start {V, AV, VAV} (RAILSsolver.m:174-197)
        a, b = tridiagonal_problem(rng)
        v1, t1, info1 = rails_tpu.solve(a, b, tol=1e-6)
        assert info1.restart_data is not None
        v2, t2, info2 = rails_tpu.solve(
            a, b, tol=1e-6, restart_data=info1.restart_data)
        assert info2.converged
        assert info2.iter <= info1.iter
        assert true_residual(a, v2, t2, b) < 1e-3


class TestKnownAnswer:
    def test_2x2_epetra_mirror(self):
        # LyapunovSolverEpetra_test.cpp:50-107: A=[0 1; -5 -5], B=-I,
        # X = V T V' = [0.62 -0.5; -0.5 0.6] to 1e-14 (fp64 CPU)
        a = jnp.array([[0.0, 1.0], [-5.0, -5.0]])
        b = -jnp.eye(2)
        v, t, info = rails_tpu.solve(a, b, tol=1e-12, expand=2,
                                     restart_upon_convergence=False)
        assert info.converged
        x = np.asarray(v @ t @ v.T)
        assert np.allclose(x, [[0.62, -0.5], [-0.5, 0.6]], atol=1e-12)

    def test_b_rectangular(self, rng):
        # B with 2 columns (B-as-matrix variant, Epetra test :109-173)
        n = 12
        a, _ = tridiagonal_problem(rng, n)
        b = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
        v, t, info = rails_tpu.solve(a, b, tol=1e-6)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-4


class TestGeneralized:
    def test_diagonal_mass(self, rng):
        # generalized equation with random positive diagonal M
        n = 20
        a, b = tridiagonal_problem(rng, n)
        md = jnp.asarray(rng.uniform(0.5, 1.5, n))
        m = rails_tpu.DiagonalOperator(md)
        v, t, info = rails_tpu.solve(a, b, m, tol=1e-6)
        assert info.converged
        assert true_residual(a, v, t, b, np.diag(np.asarray(md))) < 1e-4

    def test_m_orthogonalization(self, rng):
        n = 20
        a, b = tridiagonal_problem(rng, n)
        md = jnp.asarray(rng.uniform(0.5, 1.5, n))
        m = rails_tpu.DiagonalOperator(md)
        v, t, info = rails_tpu.solve(a, b, m, tol=1e-6, ortho="M")
        assert info.converged
        # V is M-orthonormal
        vmv = np.asarray(v).T @ np.diag(np.asarray(md)) @ np.asarray(v)
        assert np.allclose(vmv, np.eye(v.shape[1]), atol=1e-8)
        assert true_residual(a, v, t, b, np.diag(np.asarray(md))) < 1e-4


class TestInfoOutputs:
    def test_resvec_monotone_ish(self, rng):
        a, b = tridiagonal_problem(rng)
        v, t, info = rails_tpu.solve(a, b, tol=1e-6)
        assert len(info.resvec) > 1
        assert info.resvec[-1] < 1e-6
        assert len(info.timevec) == len(info.resvec)

    def test_not_converged_status(self, rng):
        a, b = tridiagonal_problem(rng)
        v, t, info = rails_tpu.solve(a, b, tol=1e-14, maxit=3)
        assert info.status == -1
        assert not info.converged

    def test_compiled_path_matches(self, rng):
        a, b = tridiagonal_problem(rng)
        v1, t1, i1 = rails_tpu.solve(a, b, tol=1e-6)
        v2, t2, i2 = rails_tpu.solve(a, b, tol=1e-6, compiled=True)
        assert i1.iter == i2.iter
        assert np.allclose(np.asarray(v1), np.asarray(v2))
        assert np.allclose(np.asarray(t1), np.asarray(t2))


class TestScalarMirror:
    """1x1 exact-value tests (the reference's ScalarWrapper mock backend,
    test/LyapunovSolver_test.cpp:15-59)."""

    def test_scalar_solve(self):
        # ScalarSolver: A=2, B=-4 -> X T X' = -4
        a = jnp.array([[2.0]])
        b = jnp.array([[-4.0]])
        v, t, info = rails_tpu.solve(a, b, tol=1e-10,
                                     restart_upon_convergence=False)
        assert info.converged
        x = float(v[0, 0]) ** 2 * float(t[0, 0])
        assert abs(x - (-4.0)) < 1e-10

    def test_nan_abort(self, rng):
        # a singular Lyapunov operator (A = 0) must abort, not hang
        a = jnp.zeros((4, 4))
        b = jnp.asarray(rng.uniform(-1, 1, (4, 1)))
        v, t, info = rails_tpu.solve(a, b, maxit=10)
        assert info.status in (-1, -2)


class TestExtras:
    def test_restart_upon_start(self, rng):
        # restart_upon_start trims an oversized initial space immediately
        # (RAILSsolver.m:53-56,455)
        n = 20
        a, b = tridiagonal_problem(rng, n)
        space = rng.uniform(-1, 1, (n, 15))
        v, t, info = rails_tpu.solve(
            a, b, tol=1e-6, space=space, restart_upon_start=True)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-4

    def test_scipy_sparse_input(self, rng):
        import scipy.sparse as sp
        a, b = tridiagonal_problem(rng)
        asp = sp.csr_matrix(np.asarray(a))
        v, t, info = rails_tpu.solve(asp, b, tol=1e-6)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-4

    def test_bcoo_input(self, rng):
        from jax.experimental.sparse import BCOO
        a, b = tridiagonal_problem(rng)
        abcoo = BCOO.fromdense(a)
        v, t, info = rails_tpu.solve(abcoo, b, tol=1e-6)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-4

    def test_continuation(self, rng):
        from rails_tpu.continuation import ContinuationSolver
        n = 20
        a, b = tridiagonal_problem(rng, n)
        a = a - 2.0 * jnp.eye(n)
        cont = ContinuationSolver(b, tol=1e-6)
        iters = []
        for theta in (0.0, 0.05, 0.1):
            a_theta = a + theta * jnp.eye(n)
            v, t, info = cont.step(a_theta)
            assert info.converged
            assert true_residual(a_theta, v, t, b) < 1e-4
            iters.append(info.iter)
        # warm-started steps converge faster than the cold start
        assert min(iters[1:]) < iters[0]

    def test_continuation_shares_engines_across_steps(self, rng):
        """Warm steps replay the previous warm step's compiled engines
        against the new Jacobian (payloads are jit ARGUMENTS): after a
        cold + two warm compiled steps, the shared cache holds exactly
        four engines - {init, while_loop} for the cold trace and for
        the warm trace (they differ in restart_upon_start / k0) - and
        the third step adds NOTHING (full reuse); correctness is
        untouched - the round-5 warm wall-clock fix."""
        from rails_tpu.continuation import ContinuationSolver
        n = 24
        a, b = tridiagonal_problem(rng, n)
        a = a - 2.0 * jnp.eye(n)
        cont = ContinuationSolver(b, tol=1e-6, reduced_size=6)
        sizes = []
        for theta in (0.0, 0.05, 0.1):
            a_theta = a + theta * jnp.eye(n)
            v, t, info = cont.step(a_theta, compiled=True)
            assert info.converged
            assert true_residual(a_theta, v, t, b) < 1e-4
            sizes.append(len(cont._engine_cache))
        assert sizes == [2, 4, 4], sizes

    def test_shared_cache_survives_b_change(self, rng):
        """Round-5 review finding (confirmed repro): r0sq was baked
        into the cached engines as a trace constant, so a continuation
        step with a 1000x smaller per-step B declared phantom
        convergence (res_est 5e-7, true residual 0.44).  r0sq now
        rides as an engine ARGUMENT."""
        from rails_tpu.continuation import ContinuationSolver
        n = 24
        a, b = tridiagonal_problem(rng, n)
        a = a - 2.0 * jnp.eye(n)
        cont = ContinuationSolver(b, tol=1e-6, reduced_size=6)
        cont.step(a, compiled=True)
        cont.step(a + 0.05 * jnp.eye(n), compiled=True)
        b3 = b * 1e-3
        a3 = a + 0.1 * jnp.eye(n)
        v, t, info = cont.step(a3, b=b3, compiled=True)
        assert info.converged
        r0 = float(np.linalg.norm(np.asarray(b3).T @ np.asarray(b3), 2))
        assert true_residual(a3, v, t, b3) / r0 < 1e-4

    def test_shared_cache_survives_m_presence_change(self, rng):
        """Round-5 review finding (confirmed repro): the init engine
        captured has_m as a closure constant, so a shared cache
        crossing M-presence silently dropped M from the first Gram
        block (reported 3.8e-9, true generalized residual 0.19).  The
        engine key now includes M presence / B kind / the resolved
        projected-solver method."""
        n = 24
        a, b = tridiagonal_problem(rng, n)
        a = a - 2.0 * jnp.eye(n)
        cache = {}
        v, t, info = rails_tpu.LyapunovSolver(
            a, b, tol=1e-8, engine_cache=cache).solve(compiled=True)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-6
        md = np.asarray(rng.uniform(0.5, 1.5, n))
        v2, t2, info2 = rails_tpu.LyapunovSolver(
            a, b, rails_tpu.DiagonalOperator(jnp.asarray(md)),
            tol=1e-8, engine_cache=cache).solve(compiled=True)
        assert info2.converged
        assert true_residual(a, v2, t2, b, m=np.diag(md)) < 1e-6

    def test_warm_step_reorthonormalizes_on_m_change(self, rng):
        """Round-5 review finding: under ortho='M' a per-step mass
        matrix invalidates the carried basis's M-orthonormality - the
        skip-reorthonormalization flag must not be set then."""
        from rails_tpu.continuation import ContinuationSolver
        n = 24
        a, b = tridiagonal_problem(rng, n)
        a = a - 2.0 * jnp.eye(n)
        m1 = rails_tpu.DiagonalOperator(
            jnp.asarray(rng.uniform(0.5, 1.5, n)))
        md2 = rng.uniform(0.5, 1.5, n)
        m2 = rails_tpu.DiagonalOperator(jnp.asarray(md2))
        cont = ContinuationSolver(b, m=m1, tol=1e-6, ortho="M")
        cont.step(a)
        v, t, info = cont.step(a + 0.05 * jnp.eye(n), m=m2)
        assert info.converged
        assert true_residual(a + 0.05 * np.eye(n), v, t, b,
                             m=np.diag(md2)) < 1e-4

    def test_engine_key_separates_traced_options(self, rng):
        """A shared engine cache must never serve an engine whose traced
        behavior differs: keys include every option read inside
        _build_iterate (restart_upon_start was the near-miss)."""
        import dataclasses

        n = 24
        a, b = tridiagonal_problem(rng, n)
        s1 = rails_tpu.LyapunovSolver(a, b, tol=1e-6)
        k1 = s1._engine_key("while_loop", 32)
        s2 = rails_tpu.LyapunovSolver(
            a, b, options=dataclasses.replace(
                s1.options, restart_upon_start=True))
        assert s2._engine_key("while_loop", 32) != k1
        s3 = rails_tpu.LyapunovSolver(a, b, tol=1e-6)
        assert s3._engine_key("while_loop", 32) == k1

    def test_continuation_save_resume(self, rng, tmp_path):
        """Cross-process continuation: save the converged subspace to
        disk, resume in a FRESH ContinuationSolver, and the next step
        still warm starts (the on-disk form of MATLAB's restart_data,
        RAILSsolver.m:174-197)."""
        from rails_tpu.continuation import ContinuationSolver
        n = 20
        a, b = tridiagonal_problem(rng, n)
        a = a - 2.0 * jnp.eye(n)
        cont = ContinuationSolver(b, tol=1e-6)
        _, _, info0 = cont.step(a)
        # suffix-less path: np.savez alone would append .npz and break
        # the round-trip (round-4 review finding)
        ckpt = str(tmp_path / "cont_checkpoint")
        cont.save(ckpt)
        cont2 = ContinuationSolver(b, tol=1e-6)
        cont2.load(ckpt)
        a2 = a + 0.05 * jnp.eye(n)
        v, t, info1 = cont2.step(a2)
        assert info1.converged
        assert true_residual(a2, v, t, b) < 1e-4
        assert info1.iter < info0.iter  # resumed warm start is faster

    def test_solver_state_invariants(self, rng):
        """Masked-state invariants (the watermark/capacity discipline of
        StlWrapper, GenericMultiVectorWrapper_test role): after every
        iteration, the active columns are orthonormal, buffers beyond k
        are exactly zero, and VAV/VBV match their definitions (for the
        blocks whose Gram products have been computed)."""
        import jax
        n = 24
        a, b = tridiagonal_problem(rng, n)
        solver = rails_tpu.LyapunovSolver(a, b, tol=1e-8)
        state, static = solver._init_state(n, jnp.dtype("float64"))
        kb = static["kb"]
        step = jax.jit(solver._build_iterate(
            dict(static, kb=kb, k_limit=min(n, kb - static["s_slot"]))))
        an = np.asarray(a)
        for _ in range(12):
            state = step(state)
            k = int(state.k)
            kdone = int(state.w_start) if int(state.n_new) > 0 else k
            v = np.asarray(state.V)
            assert np.allclose(v[:, :k].T @ v[:, :k], np.eye(k), atol=1e-12)
            assert np.all(v[:, k:] == 0.0)
            assert np.all(np.asarray(state.VAV)[k:, :] == 0.0)
            assert np.all(np.asarray(state.VAV)[:, k:] == 0.0)
            # Gram blocks computed so far match definitions
            av = np.asarray(state.AV)[:, :kdone]
            assert np.allclose(av, an @ v[:, :kdone], atol=1e-12)
            vav = np.asarray(state.VAV)[:kdone, :kdone]
            assert np.allclose(vav, v[:, :kdone].T @ an @ v[:, :kdone],
                               atol=1e-11)
            if bool(state.done):
                break

    def test_absolute_restart_tolerance(self, rng):
        # C++ absolute-filter semantics (LyapunovSolver.hpp:469-477)
        n = 20
        a, b = tridiagonal_problem(rng, n)
        a = a - 3.0 * jnp.eye(n)
        v, t, info = rails_tpu.solve(
            a, b, tol=1e-6, restart_iterations=8,
            restart_tolerance=1e-8, restart_tolerance_mode="absolute")
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-4
