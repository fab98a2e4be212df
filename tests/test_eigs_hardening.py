"""Eigensolver robustness (VERDICT round-1 item 6): convergence status
reporting, no silent unconverged returns, clustered and complex-pair
spectra at n >= 500, num near the subspace size.

Mirrors the role of Anasazi's returned status
(/root/reference/src/Epetra_OperatorWrapper.cpp:147-222)."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from rails_tpu import DenseOperator
from rails_tpu.eigs import EigsConvergenceWarning, eigs, eigs_general
from rails_tpu.sparse.formats import sparse_from_scipy


class TestEigsSymmetric:
    def test_clustered_spectrum_n500(self):
        # leading cluster 10, 9.999, 9.998 then a gap - the classic
        # hard case for plain Lanczos
        n = 500
        d = np.linspace(0.1, 5.0, n)
        d[-1], d[-2], d[-3] = 10.0, 9.999, 9.998
        op = sparse_from_scipy(sp.diags(d).tocsr(), fmt="dia", is_spd=True)
        evals, evecs, info = eigs(op, num=3, tol=1e-9, return_info=True)
        assert info.converged
        assert np.allclose(np.sort(np.asarray(evals)),
                           [9.998, 9.999, 10.0], atol=1e-7)
        # eigenvectors are the corresponding coordinate directions
        for j, lam in enumerate(np.asarray(evals)):
            i = int(np.argmin(np.abs(d - lam)))
            assert abs(abs(float(evecs[i, j])) - 1.0) < 1e-5

    def test_unconverged_warns(self):
        n = 500
        d = np.linspace(1.0, 2.0, n)  # flat spectrum, no gap
        op = sparse_from_scipy(sp.diags(d).tocsr(), fmt="dia", is_spd=True)
        with pytest.warns(EigsConvergenceWarning):
            _, _, info = eigs(op, num=4, tol=1e-14, max_restarts=1,
                              subspace=8, return_info=True)
        assert not info.converged

    def test_num_near_subspace(self):
        # subspace barely larger than num must not break the restart
        n = 64
        d = np.arange(1.0, n + 1.0)
        op = DenseOperator(jnp.asarray(np.diag(d)), is_symmetric=True)
        evals, evecs, info = eigs(op, num=10, subspace=11, tol=1e-8,
                                  return_info=True)
        assert np.allclose(np.sort(np.asarray(evals)),
                           np.arange(55.0, 65.0), atol=1e-6)

    def test_num_equals_m_exact(self):
        # full-space request: one exact sweep, no spinning
        n = 24
        d = np.arange(1.0, n + 1.0)
        op = DenseOperator(jnp.asarray(np.diag(d)), is_symmetric=True)
        evals, _, info = eigs(op, num=n, tol=1e-12, return_info=True)
        assert info.restarts <= 2
        assert np.allclose(np.sort(np.asarray(evals)), d, atol=1e-8)


class TestBlockLanczos:
    """Anasazi Block-Krylov-Schur capability (VERDICT r02 item 7,
    /root/reference/src/Epetra_OperatorWrapper.cpp:147-222, block size
    at :166): eigenvalue multiplicity up to the block size is
    recovered from the block Krylov space directly, where a
    single-vector space contains one direction per eigenspace."""

    @pytest.fixture(scope="class")
    def mult3_operator(self):
        # dense (non-diagonal) symmetric operator with a multiplicity-3
        # dominant eigenvalue at n=1000 over a decaying continuum
        n = 1000
        d = np.concatenate([[10.0, 10.0, 10.0],
                            np.linspace(5.0, 0.1, n - 3)])
        rng = np.random.default_rng(7)
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a = (q * d) @ q.T
        return DenseOperator(jnp.asarray(0.5 * (a + a.T)),
                             is_symmetric=True)

    def test_single_sweep_multiplicity(self, mult3_operator):
        # one sweep, no restart: the single-vector Krylov space contains
        # exactly one copy of the triple eigenvalue (the other "pairs"
        # are continuum contamination); the block-3 space holds all
        # three copies at once
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", EigsConvergenceWarning)
            ev1, _ = eigs(mult3_operator, num=3, tol=1e-10,
                          max_restarts=1, block_size=1)
            ev3, _ = eigs(mult3_operator, num=3, tol=1e-10,
                          max_restarts=1, block_size=3)
        ev1, ev3 = np.asarray(ev1), np.asarray(ev3)
        assert abs(ev1[0] - 10.0) < 1e-6
        assert ev1[1] < 6.0  # second copy missing from the single space
        assert np.all(np.abs(ev3 - 10.0) < 0.01)  # all three present

    def test_block_recovers_multiplicity(self, mult3_operator):
        ev, vecs, info = eigs(mult3_operator, num=3, tol=1e-9,
                              max_restarts=10, block_size=3,
                              return_info=True)
        assert info.converged
        ev, vecs = np.asarray(ev), np.asarray(vecs)
        assert np.allclose(ev, 10.0, atol=1e-8)
        assert np.allclose(vecs.T @ vecs, np.eye(3), atol=1e-9)
        av = np.asarray(mult3_operator.matmat(jnp.asarray(vecs)))
        assert np.linalg.norm(av - 10.0 * vecs) < 1e-6

    def test_block_one_matches_default(self):
        n = 300
        d = np.linspace(0.5, 8.0, n)
        op = DenseOperator(jnp.asarray(np.diag(d)), is_symmetric=True)
        e1, v1 = eigs(op, num=4, tol=1e-9)
        e2, v2 = eigs(op, num=4, tol=1e-9, block_size=1)
        assert np.array_equal(np.asarray(e1), np.asarray(e2))
        assert np.array_equal(np.asarray(v1), np.asarray(v2))


class TestEigsGeneral:
    def test_complex_pairs_n500(self):
        # block-diagonal with dominant 2x2 rotation blocks -> leading
        # complex-conjugate pairs
        n = 500
        blocks = [np.array([[0.5, 3.0], [-3.0, 0.5]]),
                  np.array([[0.3, 2.0], [-2.0, 0.3]])]
        a = np.diag(np.linspace(-1.0, 1.0, n))
        a[0:2, 0:2] = blocks[0]
        a[2:4, 2:4] = blocks[1]
        op = DenseOperator(jnp.asarray(a))
        evals, evecs, info = eigs_general(op, num=4, tol=1e-7,
                                          return_info=True)
        assert info.converged
        got = np.asarray(evals)
        want = np.array([0.5 + 3j, 0.5 - 3j, 0.3 + 2j, 0.3 - 2j])
        for w in want:  # conjugate ordering is float-noise dependent
            assert np.abs(got - w).min() < 1e-5
        # residual check A v = lambda v
        for j in range(4):
            v = np.asarray(evecs[:, j])
            r = a @ v - np.asarray(evals)[j] * v
            assert np.linalg.norm(r) < 1e-5 * abs(np.asarray(evals)[0])

    def test_unconverged_warns(self):
        n = 300
        rng = np.random.default_rng(0)
        a = rng.uniform(-1, 1, (n, n)) / np.sqrt(n)
        op = DenseOperator(jnp.asarray(a))
        with pytest.warns(EigsConvergenceWarning):
            _, _, info = eigs_general(op, num=6, tol=1e-13, max_restarts=1,
                                      subspace=10, return_info=True)
        assert not info.converged
        assert info.residuals.shape == (6,)

    def test_clustered_real_dominant(self):
        # two near-equal dominant real eigenvalues
        n = 500
        d = np.linspace(0.0, 1.0, n)
        d[-1], d[-2] = 5.0, 4.9999
        a = np.diag(d)
        # make it genuinely nonsymmetric below the dominant part
        a[10, 11] = 0.7
        a[11, 10] = -0.2
        op = DenseOperator(jnp.asarray(a))
        evals, evecs, info = eigs_general(op, num=2, tol=1e-7,
                                          max_restarts=200,
                                          return_info=True)
        got = np.sort(np.real(np.asarray(evals)))
        assert np.allclose(got, [4.9999, 5.0], atol=1e-5)

    def test_block_recovers_nonsymmetric_multiplicity3(self):
        """Nonsymmetric eigenvalue multiplicity 3 at n=500 (VERDICT r03
        item 8): block Arnoldi (block_size=3) represents the
        3-dimensional dominant eigenspace directly, mirroring Anasazi's
        Block Krylov-Schur
        (/root/reference/src/Epetra_OperatorWrapper.cpp:147-222)."""
        n = 500
        rng = np.random.default_rng(7)
        # triangular core: diag gives the spectrum; the 3 dominant
        # entries equal (semisimple: no coupling WITHIN the 2-block),
        # nonnormal coupling to the rest, rotated by orthogonal Q
        b = np.diag(np.concatenate([[2.0, 2.0, 2.0],
                                    rng.uniform(-1.2, 1.2, n - 3)]))
        b[0:3, 3:] = rng.uniform(-0.3, 0.3, (3, n - 3))
        b[3:, 3:] += np.triu(rng.uniform(-0.1, 0.1, (n - 3, n - 3)), 1)
        q, _ = np.linalg.qr(rng.uniform(-1, 1, (n, n)))
        a = q @ b @ q.T
        op = DenseOperator(jnp.asarray(a))
        evals, evecs, info = eigs_general(op, num=3, tol=1e-8,
                                          block_size=3, max_restarts=150,
                                          return_info=True)
        got = np.asarray(evals)
        assert np.allclose(np.real(got), 2.0, atol=1e-6)
        assert np.allclose(np.imag(got), 0.0, atol=1e-6)
        # the three returned vectors span a genuinely 3-dimensional
        # space (no duplicated cluster member)
        v = np.asarray(evecs[:, :3])
        s = np.linalg.svd(v, compute_uv=False)
        assert s[2] > 1e-3
        for j in range(3):
            r = a @ v[:, j] - got[j] * v[:, j]
            assert np.linalg.norm(r) < 1e-6 * abs(got[0])

    def test_tight_cluster_independent_vectors(self):
        """Two dominant Ritz values separated by ~10 eps (VERDICT r03
        weak 6): the fixed-shift inverse iteration could return the
        same cluster member twice; the ztrevc-style back-substitution
        ties each vector to its own Schur position."""
        n = 500
        rng = np.random.default_rng(3)
        sep = 5e-15  # ~20 eps at this scale
        d = np.concatenate([[3.0, 3.0 * (1 + sep)],
                            rng.uniform(-1.0, 1.0, n - 2)])
        b = np.diag(d)
        b[0, 2:] = rng.uniform(-0.2, 0.2, n - 2)
        b[1, 2:] = rng.uniform(-0.2, 0.2, n - 2)
        q, _ = np.linalg.qr(rng.uniform(-1, 1, (n, n)))
        a = q @ b @ q.T
        op = DenseOperator(jnp.asarray(a))
        evals, evecs, info = eigs_general(op, num=2, tol=1e-8,
                                          block_size=2, max_restarts=150,
                                          return_info=True)
        got = np.asarray(evals)
        assert np.allclose(np.real(got), 3.0, atol=1e-6)
        v = np.asarray(evecs[:, :2])
        s = np.linalg.svd(v, compute_uv=False)
        # independent vectors, not the same member twice
        assert s[1] > 1e-3
        for j in range(2):
            r = a @ v[:, j] - got[j] * v[:, j]
            assert np.linalg.norm(r) < 1e-6 * abs(got[0])

    def test_coincident_cluster_no_overflow(self):
        """8-fold COINCIDENT dominant eigenvalue: unscaled ztrevc
        back-substitution grows like (1/eps)^depth and overflowed to
        inf/NaN vectors (round-4 review finding); the pivot-floor
        escalation ladder keeps everything finite."""
        n = 300
        rng = np.random.default_rng(5)
        d = np.concatenate([np.full(8, 2.0), rng.uniform(-1.0, 1.0,
                                                         n - 8)])
        b = np.diag(d)
        b[0:8, 8:] = rng.uniform(-0.2, 0.2, (8, n - 8))
        q, _ = np.linalg.qr(rng.uniform(-1, 1, (n, n)))
        a = q @ b @ q.T
        op = DenseOperator(jnp.asarray(a))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", EigsConvergenceWarning)
            evals, evecs, info = eigs_general(op, num=8, tol=1e-6,
                                              block_size=8,
                                              max_restarts=80,
                                              return_info=True)
        got = np.asarray(evals)
        v = np.asarray(evecs)
        assert np.all(np.isfinite(got.real)) and np.all(
            np.isfinite(got.imag))
        assert np.all(np.isfinite(v.real)) and np.all(np.isfinite(v.imag))
        assert np.allclose(np.real(got), 2.0, atol=1e-5)
        # the returned vectors span a genuinely multi-dimensional space
        s = np.linalg.svd(v[:, :8], compute_uv=False)
        assert s[3] > 1e-4  # at least 4 independent directions

    def test_general_block_one_matches_default(self):
        n = 200
        rng = np.random.default_rng(11)
        d = np.concatenate([[4.0], rng.uniform(-1, 1, n - 1)])
        a = np.diag(d)
        a[0, 1:] = rng.uniform(-0.2, 0.2, n - 1)
        op = DenseOperator(jnp.asarray(a))
        e1, _ = eigs_general(op, num=1, tol=1e-9)
        e2, _ = eigs_general(op, num=1, tol=1e-9, block_size=1)
        assert np.allclose(np.asarray(e1), np.asarray(e2), atol=1e-9)

    def test_backward_compat_tuple_return(self):
        n = 50
        a = np.diag(np.arange(1.0, n + 1.0))
        op = DenseOperator(jnp.asarray(a))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", EigsConvergenceWarning)
            evals, evecs = eigs_general(op, num=1)
        assert abs(complex(np.asarray(evals)[0]) - n) < 1e-6
