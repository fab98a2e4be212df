"""Residual-corrected (iteratively refined) f32 solves reach the 1e-8
BASELINE target (BASELINE.md: "converge the reference test-suite problems
to ||R||/||B B'|| <= 1e-8") that a single f32 solve cannot (measured
floor ~1e-6 from the f32 factor representation).  All verification is
f64 on the host against the composed factors."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import rails_tpu
from rails_tpu.refine import cholqr2, residual_factor, solve_refined
from rails_tpu.core.solver import LyapunovSolver
from rails_tpu.sparse.formats import sparse_from_scipy


def _tridiag_problem(rng, n=512):
    """Reference-suite-style stable tridiagonal (LyapunovSolver_test.cpp
    get_tridiagonal_problem analogue), entries exactly f32-representable
    so the f64 verification judges the solver, not input quantization."""
    q = lambda x: np.round(x * 1024) / 1024
    main = q(-2.0 - rng.uniform(0, 1, n))
    up = q(0.4 * rng.uniform(-1, 1, n - 1))
    lo = q(0.4 * rng.uniform(-1, 1, n - 1))
    a = sp.diags([lo, main, up], [-1, 0, 1]).tocsr()
    b32 = np.asarray(rng.uniform(-1, 1, (n, 3)), np.float32)
    return a, b32


def _true_rel(a_dense, x, b64, m_dense=None):
    if m_dense is None:
        r = a_dense @ x + x @ a_dense.T + b64 @ b64.T
    else:
        r = a_dense @ x @ m_dense.T + m_dense @ x @ a_dense.T + b64 @ b64.T
    return np.linalg.norm(r, 2) / np.linalg.norm(b64.T @ b64, 2)


class TestSignedRhs:
    def test_solver_accepts_signed_b(self, rng):
        """A X + X A' + B S B' = 0 with indefinite S, verified in f64."""
        n = 64
        a, _ = _tridiag_problem(rng, n)
        u = np.asarray(rng.uniform(-1, 1, (n, 4)))
        s = np.diag([1.0, -0.5, 0.25, -0.125])
        solver = LyapunovSolver(
            sparse_from_scipy(a, fmt="dia"), jnp.asarray(u),
            b_sign=jnp.asarray(s), tol=1e-9)
        v, t, info = solver.solve()
        assert info.converged
        ad = a.toarray()
        x = np.asarray(v) @ np.asarray(t) @ np.asarray(v).T
        r = ad @ x + x @ ad.T + u @ s @ u.T
        assert np.linalg.norm(r, 2) < 1e-7 * np.linalg.norm(u @ s @ u.T, 2)


class TestCholQR2:
    def test_orthonormalizes(self, rng):
        u = jnp.asarray(rng.uniform(-1, 1, (300, 12)))
        q, r = cholqr2(u)
        assert np.abs(np.asarray(q.T @ q) - np.eye(12)).max() < 1e-12
        assert np.abs(np.asarray(q @ r) - np.asarray(u)).max() < 1e-12


class TestResidualFactor:
    def test_exact_representation(self, rng):
        n = 256
        a, b32 = _tridiag_problem(rng, n)
        aop = sparse_from_scipy(a, fmt="dia", dtype=jnp.float32)
        s1 = LyapunovSolver(aop, jnp.asarray(b32), tol=1e-5,
                            dtype=jnp.float32, maxit=100, expand=3)
        v0, t0, _ = s1.solve()
        u2, s2, rep_err, r_norm = residual_factor(
            s1.A, None, jnp.asarray(b32), None, v0, t0)
        ad = a.toarray()
        b64 = b32.astype(np.float64)
        v64 = np.asarray(v0, np.float64)
        x0 = v64 @ np.asarray(t0, np.float64) @ v64.T
        r0 = ad @ x0 + x0 @ ad.T + b64 @ b64.T
        got = np.asarray(u2, np.float64) @ np.asarray(s2, np.float64) \
            @ np.asarray(u2, np.float64).T
        actual = np.linalg.norm(r0 - got)
        # the claimed (f64-measured) representation error is honest and
        # tiny relative to ||R0||
        assert actual < 2 * rep_err + 1e-12
        assert actual < 1e-4 * np.linalg.norm(r0, 2) + 1e-12
        assert abs(r_norm - np.linalg.norm(r0, 2)) < 0.05 * r_norm


class TestSolveRefined:
    def test_f32_reaches_1e8(self, rng):
        n = 512
        a, b32 = _tridiag_problem(rng, n)
        aop = sparse_from_scipy(a, fmt="dia", dtype=jnp.float32)
        v, t, info = solve_refined(aop, jnp.asarray(b32), tol=1e-8,
                                   dtype=jnp.float32, maxit=100, expand=3)
        assert info.converged
        x = np.asarray(v, np.float64) @ np.asarray(t, np.float64) \
            @ np.asarray(v, np.float64).T
        true_rel = _true_rel(a.toarray(), x, b32.astype(np.float64))
        assert true_rel <= 2e-8, true_rel
        # the driver's estimate is honest (within 3x of truth)
        assert info.res <= 3 * max(true_rel, 1e-10)

    def test_f32_generalized_reaches_1e8(self, rng):
        n = 512
        a, b32 = _tridiag_problem(rng, n)
        md = (0.5 + np.floor(rng.uniform(0, 64, n)) / 64).astype(np.float32)
        aop = sparse_from_scipy(a, fmt="dia", dtype=jnp.float32)
        mop = rails_tpu.DiagonalOperator(jnp.asarray(md))
        v, t, info = solve_refined(aop, jnp.asarray(b32), mop, tol=1e-8,
                                   dtype=jnp.float32, maxit=100, expand=3)
        assert info.converged
        x = np.asarray(v, np.float64) @ np.asarray(t, np.float64) \
            @ np.asarray(v, np.float64).T
        true_rel = _true_rel(a.toarray(), x, b32.astype(np.float64),
                             np.diag(md.astype(np.float64)))
        assert true_rel <= 2e-8, true_rel

    def test_single_f32_solve_cannot(self, rng):
        """Control: one f32 solve at the same budget floors above 1e-7 -
        the refinement is doing real work."""
        n = 512
        a, b32 = _tridiag_problem(rng, n)
        aop = sparse_from_scipy(a, fmt="dia", dtype=jnp.float32)
        v, t, info = rails_tpu.solve(aop, jnp.asarray(b32), tol=1e-8,
                                     dtype=jnp.float32, maxit=100, expand=3)
        x = np.asarray(v, np.float64) @ np.asarray(t, np.float64) \
            @ np.asarray(v, np.float64).T
        true_rel = _true_rel(a.toarray(), x, b32.astype(np.float64))
        assert true_rel > 5e-8  # the f32 single-solve floor

    def test_tol_above_floor_single_stage(self, rng):
        """A loose tol returns after one stage (no wasted correction)."""
        n = 256
        a, b32 = _tridiag_problem(rng, n)
        aop = sparse_from_scipy(a, fmt="dia", dtype=jnp.float32)
        v, t, info = solve_refined(aop, jnp.asarray(b32), tol=1e-4,
                                   dtype=jnp.float32, maxit=100, expand=3)
        assert info.converged
        assert len(info.stages) == 1
