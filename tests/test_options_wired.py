"""Every SolverOptions knob changes observable behavior (VERDICT round-1
item 5): block fast orthogonalization, restart_from_solution,
lanczos_tolerance, plus the general-M singularity check (item 7) and the
complex-payload/real-dtype guard (ADVICE round 1)."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import rails_tpu
from rails_tpu import DenseOperator
from rails_tpu.core.options import InvalidOption, SingularMassMatrixWarning
from rails_tpu.sparse.formats import sparse_from_scipy

from tests.test_solver import tridiagonal_problem, true_residual


class TestFastOrthogonalization:
    @pytest.mark.parametrize("fast", [True, False])
    def test_converges_and_orthonormal(self, rng, fast):
        a, b = tridiagonal_problem(rng)
        v, t, info = rails_tpu.solve(
            a, b, tol=1e-6, fast_orthogonalization=fast)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-3
        g = np.asarray(v.T @ v)
        assert np.abs(g - np.eye(g.shape[0])).max() < 1e-8

    def test_fast_with_restarts(self, rng):
        n = 20
        a, b = tridiagonal_problem(rng, n)
        v, t, info = rails_tpu.solve(
            a, b, tol=1e-3, restart_size=19, reduced_size=15, expand=1,
            fast_orthogonalization=True, restart_upon_convergence=False)
        assert info.converged
        assert true_residual(a, v, t, b) < 1e-3

    def test_fast_m_orthogonalization(self, rng):
        # fast path in the M-inner product (MATLAB Morth fast+M variant,
        # /root/reference/matlab/RAILSsolver.m:554-567)
        n = 20
        a, b = tridiagonal_problem(rng, n)
        md = jnp.asarray(rng.uniform(0.5, 1.5, n))
        mop = rails_tpu.DiagonalOperator(md)
        v, t, info = rails_tpu.solve(
            a, b, mop, tol=1e-4, ortho="M", fast_orthogonalization=True)
        assert info.converged
        # V is M-orthonormal
        g = np.asarray(v.T @ (np.asarray(md)[:, None] * v))
        assert np.abs(g - np.eye(g.shape[0])).max() < 1e-8
        assert true_residual(a, v, t, b, m=np.diag(np.asarray(md))) < 1e-3


class TestRestartFromSolution:
    def test_requires_space(self):
        a = -np.eye(4)
        b = np.ones((4, 1))
        with pytest.raises(InvalidOption):
            rails_tpu.LyapunovSolver(a, b, restart_from_solution=True)

    def test_warm_start_from_previous_v(self, rng):
        # the C++ continuation use case
        # (/root/reference/test/LyapunovSolver_test.cpp:312-352)
        n = 20
        a, b = tridiagonal_problem(rng, n)
        v1, t1, info1 = rails_tpu.solve(a, b, tol=1e-8)
        assert info1.converged
        a2 = a.at[n - 1, n - 1].set(4.0)
        v2, t2, info2 = rails_tpu.solve(
            a2, b, tol=1e-8, space=v1, restart_from_solution=True)
        assert info2.converged
        assert true_residual(a2, v2, t2, b) < 1e-3
        # the previous basis must have been taken as-is (orthonormal
        # input -> no re-orthogonalization mixing): the first columns of
        # the solve's search space span exactly v1's directions, so a
        # second warm solve on the *same* A converges immediately
        v3, t3, info3 = rails_tpu.solve(
            a, b, tol=1e-8, space=v1, restart_from_solution=True)
        assert info3.converged
        assert info3.iter <= 2


class TestLanczosTolerance:
    def test_changes_residual_estimates(self, rng):
        a, b = tridiagonal_problem(rng)
        _, _, info_ref = rails_tpu.solve(a, b, tol=1e-6)
        # a huge tolerance truncates the residual Lanczos after the
        # first steps -> visibly different residual estimates
        _, _, info_trunc = rails_tpu.solve(
            a, b, tol=1e-6, lanczos_tolerance=0.5)
        r1, r2 = info_ref.resvec, info_trunc.resvec
        k = min(len(r1), len(r2))
        assert (len(r1) != len(r2)
                or not np.allclose(r1[:k], r2[:k], rtol=1e-6))


class TestGeneralSingularM:
    def _problem(self, n=16):
        a = -2.0 * np.eye(n) + 0.3 * np.eye(n, k=1)
        b = np.ones((n, 1))
        return a, b

    def test_singular_nondiagonal_m_warns(self):
        n = 16
        a, b = self._problem(n)
        m = sp.diags([0.3, 1.0, 0.3], [-1, 0, 1], (n, n)).tolil()
        m[n - 1, :] = 0.0  # exactly singular, non-diagonal
        mop = sparse_from_scipy(m.tocsr(), fmt="ell")
        with pytest.warns(SingularMassMatrixWarning):
            rails_tpu.LyapunovSolver(a, b, mop)

    def test_nonsingular_nondiagonal_m_silent(self):
        n = 16
        a, b = self._problem(n)
        m = sp.diags([0.3, 2.0, 0.3], [-1, 0, 1], (n, n)).tocsr()
        mop = sparse_from_scipy(m, fmt="dia")
        with warnings.catch_warnings():
            warnings.simplefilter("error", SingularMassMatrixWarning)
            rails_tpu.LyapunovSolver(a, b, mop)

    def test_singular_dense_m_warns(self):
        n = 16
        a, b = self._problem(n)
        m = np.eye(n)
        m[0, 0] = 0.0
        with pytest.warns(SingularMassMatrixWarning):
            rails_tpu.LyapunovSolver(a, b, DenseOperator(m))


class TestDtypeGuards:
    def test_complex_payload_real_dtype_raises(self):
        a = (-np.eye(4) + 1j * np.triu(np.ones((4, 4)), 1)).astype(complex)
        b = np.ones((4, 1))
        with pytest.raises(InvalidOption):
            rails_tpu.LyapunovSolver(DenseOperator(a), b, dtype=np.float32)

    def test_hyb_astype_same_dtype_is_self(self):
        # banded + 120 stray entries on distinct off-stencil diagonals,
        # one per row (too many diagonals for pure DIA, skinny remainder)
        n = 512
        m = sp.diags([1.0, -4.0, 1.0], [-1, 0, 1], (n, n)).tolil()
        for i in range(120):
            m[i, 2 * i + 30] = 0.5
        op = sparse_from_scipy(m.tocsr(), fmt="hyb")
        assert op.format == "hyb"
        op32 = op.astype(jnp.float32)
        assert op32.astype(jnp.float32) is op32
