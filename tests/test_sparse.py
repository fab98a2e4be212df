"""Sparse format tests + the backend contract suite.

The contract tests play the role of the reference's generic typed-test
suites (GenericOperatorWrapper_test.cpp / GenericMultiVectorWrapper_test
.cpp): every operator backend must behave identically on the same
matrix, which is what guarantees the solver can host any backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import rails_tpu
from rails_tpu.models.problems import laplacian2, random_sparse
from rails_tpu.sparse.formats import (
    sparse_from_dense,
    sparse_from_scipy,
    sparse_from_csr,
)


def make_backends(a_dense, **tags):
    """The same matrix as every operator backend."""
    return {
        "dense": rails_tpu.DenseOperator(jnp.asarray(a_dense), **tags),
        "dia": sparse_from_dense(a_dense, fmt="dia", **tags),
        "ell": sparse_from_dense(a_dense, fmt="ell", **tags),
        "callable": rails_tpu.CallableOperator(
            lambda x, a=jnp.asarray(a_dense): a @ x,
            a_dense.shape,
            rfn=lambda x, a=jnp.asarray(a_dense): a.T @ x, **tags),
    }


class TestFormatCorrectness:
    @pytest.mark.parametrize("kind", ["tridiag", "laplace", "random",
                                      "rect_tall", "rect_wide"])
    def test_matmat_matches_dense(self, rng, kind):
        if kind == "tridiag":
            a = np.diag(rng.uniform(-1, 1, 30)) \
                + np.diag(rng.uniform(-1, 1, 29), 1) \
                + np.diag(rng.uniform(-1, 1, 29), -1)
        elif kind == "laplace":
            a = laplacian2(64)
        elif kind == "random":
            a = random_sparse(rng, 50)
        elif kind == "rect_tall":
            a = np.zeros((40, 25))
            a[rng.integers(0, 40, 60), rng.integers(0, 25, 60)] = \
                rng.uniform(-1, 1, 60)
        else:
            a = np.zeros((25, 40))
            a[rng.integers(0, 25, 60), rng.integers(0, 40, 60)] = \
                rng.uniform(-1, 1, 60)
        x = rng.uniform(-1, 1, (a.shape[1], 3))
        xt = rng.uniform(-1, 1, (a.shape[0], 3))
        for fmt in ("dia", "ell"):
            op = sparse_from_dense(a, fmt=fmt)
            assert np.allclose(np.asarray(op.matmat(jnp.asarray(x))),
                               a @ x, atol=1e-12), fmt
            assert np.allclose(np.asarray(op.rmatmat(jnp.asarray(xt))),
                               a.T @ xt, atol=1e-12), fmt

    def test_auto_format_selection(self, rng):
        lap = sparse_from_dense(laplacian2(64))
        assert lap.format == "dia"
        rnd = sparse_from_dense(random_sparse(rng, 100))
        assert rnd.format == "ell"

    def test_symmetric_detection(self):
        lap = sparse_from_dense(laplacian2(64))
        assert lap.is_symmetric
        assert lap.bwd is None

    def test_from_csr(self, rng):
        a = sp.random(37, 37, density=0.1, random_state=42, format="csr")
        op = sparse_from_csr(a.indptr, a.indices, a.data)
        x = rng.uniform(-1, 1, (37, 2))
        assert np.allclose(np.asarray(op.matmat(jnp.asarray(x))),
                           a @ x, atol=1e-12)
        assert op.nnz == a.nnz

    def test_under_jit(self, rng):
        """Sparse operators are pytrees: pass through jit as arguments."""
        a = laplacian2(64)
        op = sparse_from_dense(a)

        @jnp.vectorize
        def _noop(x):
            return x

        import jax

        @jax.jit
        def apply(op, x):
            return op.matmat(x)

        x = jnp.asarray(rng.uniform(-1, 1, (64, 2)))
        assert np.allclose(np.asarray(apply(op, x)), a @ np.asarray(x),
                           atol=1e-12)


class TestBackendContract:
    """Identical behavior across all operator backends on one matrix
    (GenericOperatorWrapper_test role)."""

    @pytest.fixture
    def problem(self, rng):
        a = laplacian2(64) + np.diag(rng.uniform(0, 0.1, 64))
        x = rng.uniform(-1, 1, (64, 4))
        return a, x

    def test_matmat_agree(self, problem):
        a, x = problem
        results = {name: np.asarray(op.matmat(jnp.asarray(x)))
                   for name, op in make_backends(a).items()}
        ref = results.pop("dense")
        for name, r in results.items():
            assert np.allclose(r, ref, atol=1e-12), name

    def test_rmatmat_agree(self, problem):
        a, x = problem
        results = {name: np.asarray(op.rmatmat(jnp.asarray(x)))
                   for name, op in make_backends(a).items()}
        ref = results.pop("dense")
        for name, r in results.items():
            assert np.allclose(r, ref, atol=1e-12), name

    def test_norm_agree(self, problem):
        a, _ = problem
        true = np.linalg.norm(a, 2)
        for name, op in make_backends(a).items():
            est = float(rails_tpu.operator_norm2(op, iters=100))
            assert abs(est - true) / true < 1e-6, name

    def test_astype_casts_payloads(self, problem):
        """Operators built at float64 (scipy default) must cast cleanly
        to the solve dtype (TPU f32 solves of f64-built operators)."""
        a, x = problem
        x32 = jnp.asarray(x, jnp.float32)
        for name, op in make_backends(a).items():
            op32 = op.astype(jnp.float32)
            y = op32.matmat(x32)
            yr = op32.rmatmat(x32)
            if name != "callable":  # matrix-free output follows operand
                assert y.dtype == jnp.float32, name
                assert yr.dtype == jnp.float32, name
            assert np.allclose(np.asarray(y, np.float64), a @ x,
                               atol=1e-3), name
            assert np.allclose(np.asarray(yr, np.float64), a.T @ x,
                               atol=1e-3), name
            # idempotent: casting to the same dtype returns self
            assert op32.astype(jnp.float32) is op32, name

    def test_solver_casts_f64_operator_to_f32(self, rng):
        """solve(dtype=f32) of an operator built at f64 must not carry
        mixed-dtype contractions (the TPU deployment shape)."""
        import warnings as _warnings

        a = sp.diags([1.0, -2.0, 1.0], [-1, 0, 1], (64, 64)).tocsr()
        aop = sparse_from_scipy(a, is_symmetric=True)  # f64 payload
        b = jnp.asarray(rng.standard_normal((64, 1)), jnp.float32)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", FutureWarning)
            v, t, info = rails_tpu.solve(aop, b, tol=1e-5,
                                         dtype=jnp.float32, maxit=80)
        assert info.converged
        assert v.dtype == jnp.float32

    def test_solver_hosts_every_backend(self, rng, problem):
        """The solver converges identically on every backend - the
        reference's core architectural guarantee (same Solver template,
        any wrapper; LyapunovSolver_test + LyapunovSolverEpetra_test)."""
        a, _ = problem
        a = a - 0.2 * np.eye(64)
        b = jnp.asarray(rng.uniform(0, 1, (64, 1)))
        results = {}
        for name, op in make_backends(a, is_symmetric=True).items():
            v, t, info = rails_tpu.solve(op, b, tol=1e-6, seed=7)
            assert info.converged, name
            results[name] = (info.iter, np.asarray(v) @ np.asarray(t)
                             @ np.asarray(v).T)
        iters = {name: r[0] for name, r in results.items()}
        assert len(set(iters.values())) == 1, iters
        xs = [r[1] for r in results.values()]
        for xo in xs[1:]:
            assert np.allclose(xs[0], xo, atol=1e-8)


class TestDiaSpmmKernel:
    def test_dispatch_matches_matmat(self, rng):
        # on CPU the dispatcher uses the jnp path; check equivalence anyway
        from rails_tpu.sparse.spmm import dia_spmm
        from rails_tpu.sparse.formats import sparse_from_dense
        a = laplacian2(256)
        op = sparse_from_dense(a, fmt="dia")
        x = jnp.asarray(rng.uniform(-1, 1, (256, 5)))
        y = dia_spmm(op.fwd, x)
        assert np.allclose(np.asarray(y), a @ np.asarray(x), atol=1e-12)

    def test_pallas_interpreter(self, rng):
        # run the pallas kernel in interpreter mode on CPU
        import jax
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.spmm import dia_spmm_pallas
        from rails_tpu.sparse.formats import sparse_from_dense
        a = laplacian2(1024)
        op = sparse_from_dense(a, fmt="dia", dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (1024, 8)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = dia_spmm_pallas(op.fwd, x, block_rows=256)
        assert np.allclose(np.asarray(y), np.asarray(op.fwd.matmat(x)),
                           atol=1e-4)

    @pytest.mark.parametrize("s", [1, 6, 13])
    def test_pallas_sublane_padding(self, rng, s):
        """Non-vreg-multiple multivector widths are padded to 8 sublanes
        before the kernel: real Mosaic rejects sublane slices that are
        not tile (8) multiples ("Slice shape along dimension 0 must be
        aligned to tiling (8)"), which the interpreter does NOT enforce
        - the round-4 n=65536 scale probe caught the solver's default
        expand=6 failing on hardware while every CPU test passed."""
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.formats import DiaMatrix
        from rails_tpu.sparse.spmm import dia_spmm_t, dia_spmm_t_halo
        m = 2048
        offsets = (-33, -1, 0, 1, 33)
        data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                           dtype=jnp.float32)
        dia = DiaMatrix(data, offsets, (m, m))
        x = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = dia_spmm_t(dia, x.T, block_rows=512).T
        assert y.shape == (m, s)
        assert np.allclose(np.asarray(y), np.asarray(dia.matmat(x)),
                           atol=1e-4)
        # halo variant: same padding, explicit halo operands
        hl = jnp.zeros((s, 128), jnp.float32)
        hh = jnp.zeros((s, 128), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            yh = dia_spmm_t_halo(dia, x.T, hl, hh).T
        assert yh.shape == (m, s)
        assert np.allclose(np.asarray(yh), np.asarray(dia.matmat(x)),
                           atol=1e-4)

    @pytest.mark.parametrize("impl", ["v2", "v3"])
    def test_pallas_interpreter_remainder_and_asymmetric(self, rng, impl):
        # m % block_rows != 0 (remainder strip) + an asymmetric stencil
        # (pad_l != tail) exercises the in-kernel first/last masking and
        # the XLA remainder patch, on both kernel schedules
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.formats import DiaMatrix
        from rails_tpu.sparse.spmm import dia_spmm_t
        m = 1100  # 4 blocks of 256 + remainder 76
        offsets = (-40, -1, 0, 2, 33)
        data = jnp.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                           dtype=jnp.float32)
        dia = DiaMatrix(data, offsets, (m, m))
        x = jnp.asarray(rng.uniform(-1, 1, (m, 3)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = dia_spmm_t(dia, x.T, block_rows=256, impl=impl).T
        assert np.allclose(np.asarray(y), np.asarray(dia.matmat(x)),
                           atol=1e-4)

    def test_halo_kernel_interpreter(self, rng):
        """Halo-aware kernel: edge-block windows come from explicit halo
        inputs (the distributed shard-local path, parallel/halo_spmm.py)
        - equals the masked kernel plus manual halo contributions."""
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.formats import DiaMatrix
        from rails_tpu.sparse.spmm import dia_spmm_t_halo
        m, s = 1024, 5
        offsets = (-130, -1, 0, 2, 130)
        pad_l = tail = 256  # round_up(130, 128)
        data = np.asarray(rng.uniform(-1, 1, (len(offsets), m)),
                          np.float32)
        x = np.asarray(rng.uniform(-1, 1, (m, s)), np.float32)
        hl = np.asarray(rng.uniform(-1, 1, (s, pad_l)), np.float32)
        hh = np.asarray(rng.uniform(-1, 1, (s, tail)), np.float32)
        # reference on the halo-extended vector
        x_ext = np.concatenate([hl.T, x, hh.T], axis=0)
        y_ref = np.zeros((m, s), np.float32)
        for k, off in enumerate(offsets):
            y_ref += data[k][:, None] * x_ext[pad_l + off:pad_l + off + m]
        dia = DiaMatrix(jnp.asarray(data), offsets, (m, m))
        with pltpu.force_tpu_interpret_mode():
            y = dia_spmm_t_halo(dia, jnp.asarray(x.T), jnp.asarray(hl),
                                jnp.asarray(hh)).T
        assert np.allclose(np.asarray(y), y_ref, atol=1e-4)


class TestEllSpmmKernel:
    """Windowed-ELL Pallas kernel (rails_tpu/sparse/ell_spmm.py) - the
    unstructured-sparsity SpMM the reference gets from Epetra CrsMatrix
    (/root/reference/src/Epetra_OperatorWrapper.cpp:75-91)."""

    @staticmethod
    def _banded_random(rng, m, ell_l, band, n=None):
        n = m if n is None else n
        base = np.arange(m)
        idx = base[:, None] * (n / m) + rng.integers(
            -band, band + 1, size=(m, ell_l))
        idx = np.clip(idx, 0, n - 1).astype(np.int64)
        val = rng.uniform(-1, 1, size=(m, ell_l))
        rows = np.repeat(base, ell_l)
        return sp.coo_matrix((val.ravel(), (rows, idx.ravel())),
                             shape=(m, n)).tocsr()

    def test_windowize_qualifies_banded(self, rng):
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = self._banded_random(rng, 1024, 7, 60)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        assert op.fwd.well is not None
        assert op.fwd.well.w % 128 == 0
        # window must cover every chunk's span
        assert op.fwd.well.w <= 512

    def test_windowize_rejects_random(self, rng):
        # genuinely random sparsity: window ~ n > cap -> no well payload
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = sp.random(4096, 4096, density=0.002, random_state=7,
                      format="csr")
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        assert op.fwd.well is None

    @pytest.mark.parametrize("m,ell_l,band", [
        (1024, 7, 60),      # multiple chunks, medium window
        (1100, 5, 33),      # m % 128 != 0 (padded-chunk path)
        (512, 13, 150),     # wide window (nw > 2)
    ])
    def test_kernel_interpreter_matches_xla(self, rng, m, ell_l, band):
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.ell_spmm import ell_spmm_t
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = self._banded_random(rng, m, ell_l, band)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        ell = op.fwd
        assert ell.well is not None
        x = jnp.asarray(rng.uniform(-1, 1, (m, 4)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = ell_spmm_t(ell.well, x.T).T
        assert np.allclose(np.asarray(y), a @ np.asarray(x), atol=1e-4)

    @pytest.mark.parametrize("s", [1, 3, 8])
    def test_kernel_interpreter_odd_widths(self, rng, s):
        # sublane padding: multivector widths that are not vreg-row
        # multiples (s=1 Lanczos vectors, s=3 expand blocks)
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.ell_spmm import ell_spmm_t
        from rails_tpu.sparse.formats import sparse_from_scipy
        m = 512
        a = self._banded_random(rng, m, 5, 40)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = ell_spmm_t(op.fwd.well, x.T).T
        assert y.shape == (m, s)
        assert np.allclose(np.asarray(y), a @ np.asarray(x), atol=1e-4)

    def test_multi_chunk_grouping(self, rng):
        """nc=4 chunks share one super-window DMA (the grid-overhead
        amortization that took the v5e kernel from 0.57 to 0.97 of the
        gather-issue ceiling); grouped output == single-chunk kernel."""
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.ell_spmm import (_ell_spmm_t_impl,
                                               ell_spmm_t, ell_windowize)
        m, ell_l, band, s = 2048, 6, 50, 5
        a = self._banded_random(rng, m, ell_l, band)
        deg = np.diff(a.indptr)
        L = int(deg.max())
        indices = np.repeat(a.indices[a.indptr[:-1]][:, None], L, axis=1)
        values = np.zeros((m, L), np.float32)
        rows = np.repeat(np.arange(m), deg)
        slots = np.arange(a.nnz) - np.repeat(a.indptr[:-1], deg)
        indices[rows, slots] = a.indices
        values[rows, slots] = a.data
        well = ell_windowize(indices, values, (m, m))
        assert well.nc == 4 and well.w_super >= well.w
        assert well.c0s.shape == (m // 128 // 4,)
        x = jnp.asarray(rng.uniform(-1, 1, (s, m)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y_nc = ell_spmm_t(well, x)
            y_1 = _ell_spmm_t_impl(well.c0, well.lidx, well.values,
                                   jnp.pad(x, ((0, 3), (0, 0))), L,
                                   well.w, m, well.lidx.shape[1])[:s]
        assert np.allclose(np.asarray(y_nc), np.asarray(y_1), atol=1e-5)
        assert np.allclose(np.asarray(y_nc), (a @ np.asarray(x).T).T,
                           atol=1e-4)

    def test_kernel_interpreter_rectangular(self, rng):
        # (m, n) with n > m: windows live in column space
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.ell_spmm import ell_spmm_t
        from rails_tpu.sparse.formats import sparse_from_scipy
        m, n = 512, 1024
        a = self._banded_random(rng, m, 5, 40, n=n)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        assert op.fwd.well is not None
        x = jnp.asarray(rng.uniform(-1, 1, (n, 3)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = ell_spmm_t(op.fwd.well, x.T).T
        assert y.shape == (m, 3)
        assert np.allclose(np.asarray(y), a @ np.asarray(x), atol=1e-4)

    @staticmethod
    def _jittered_stencil(rng, m, offsets, jitter=4):
        """Stencil with per-entry index jitter: the row patterns are
        consistent across a chunk (entries bucket the same way), so the
        sliced layout's padding stays ~2x - the post-RCM mesh shape."""
        base = np.arange(m)
        idx = base[:, None] + np.asarray(offsets)[None, :] + rng.integers(
            -jitter, jitter + 1, size=(m, len(offsets)))
        idx = np.clip(idx, 0, m - 1)
        val = rng.uniform(-1, 1, size=idx.shape)
        rows = np.repeat(base, len(offsets))
        return sp.coo_matrix((val.ravel(), (rows, idx.ravel())),
                             shape=(m, m)).tocsr()

    def test_vmem_budget_guard(self, rng):
        # wide multivectors overflow the (2, s_pad, w) window scratch;
        # the dispatcher must fall back to XLA instead of failing
        # Mosaic compilation (ADVICE r02)
        from rails_tpu.sparse.ell_spmm import (
            _SCRATCH_BUDGET_BYTES, window_fits_vmem)
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = self._banded_random(rng, 1024, 7, 60)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        well = op.fwd.well
        assert window_fits_vmem(well, 16)
        s_over = _SCRATCH_BUDGET_BYTES // (2 * well.w * 4) + 8
        assert not window_fits_vmem(well, s_over)
        # the oversized apply still computes correctly via the XLA path
        x = jnp.asarray(rng.uniform(-1, 1, (1024, 4)), jnp.float32)
        y = np.asarray(op.matmat(x))
        assert np.allclose(y, a @ np.asarray(x), atol=1e-4)

    @pytest.mark.parametrize("m,offsets", [
        (1024, (-130, -60, -1, 0, 1, 59, 131)),
        (1100, (-40, 0, 41, 97, 160)),
    ])
    def test_sliced_layout_matches(self, rng, m, offsets):
        # sliced-window layout: one gather per slot from sb[chunk, slot]
        from jax.experimental.pallas import tpu as pltpu
        from rails_tpu.sparse.ell_spmm import ell_windowize, ell_spmm_t
        a = self._jittered_stencil(rng, m, offsets)
        import rails_tpu.sparse.formats as fm
        ell = fm._ell_from_scipy(a, jnp.float32)
        well = ell_windowize(np.asarray(ell.indices),
                             np.asarray(ell.values), (m, m),
                             layout="sliced")
        assert well is not None and well.sb is not None
        # padding bounded by the acceptance factor
        assert well.lidx.shape[0] <= int(np.ceil(2.5 * ell.values.shape[1]))
        # every live sliced entry's index is within one sub-block
        assert int(jnp.max(well.lidx)) < 128
        x = jnp.asarray(rng.uniform(-1, 1, (m, 4)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = ell_spmm_t(well, x.T).T
        assert np.allclose(np.asarray(y), a @ np.asarray(x), atol=1e-4)

    def test_sliced_rejects_costly_padding(self, rng):
        # rows whose entries pile into one sub-block per row but different
        # sub-blocks across rows force L' ~ nw*L -> masked layout wins
        from rails_tpu.sparse.ell_spmm import ell_windowize
        m, ell_l = 512, 8
        idx = np.zeros((m, ell_l), np.int64)
        for i in range(m):
            base = (i % 4) * 128  # all 8 entries in one of 4 sub-blocks
            idx[i] = base + np.arange(ell_l)
        val = np.ones((m, ell_l))
        rows = np.repeat(np.arange(m), ell_l)
        a = sp.coo_matrix((val.ravel(), (rows, idx.ravel())),
                          shape=(m, m)).tocsr()
        import rails_tpu.sparse.formats as fm
        ell = fm._ell_from_scipy(a, jnp.float32)
        well = ell_windowize(np.asarray(ell.indices),
                             np.asarray(ell.values), (m, m),
                             layout="sliced")
        assert well is None  # L' = 4*8 > 2.5*8
        well_auto = ell_windowize(np.asarray(ell.indices),
                                  np.asarray(ell.values), (m, m),
                                  layout="auto")
        assert well_auto is not None and well_auto.sb is None

    def test_hyb_remainder_gets_windowed(self, rng):
        # HYB split: dense diagonals -> DIA, strays -> ELL; the ELL
        # remainder should carry a windowed payload when it is banded
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = sp.csr_matrix(laplacian2(1024)).tolil()
        base = np.arange(0, 1024, 16)
        for i in base:
            a[i, min(i + 37, 1023)] = 0.5   # off-stencil strays
        op = sparse_from_scipy(a.tocsr(), fmt="hyb", dtype=jnp.float32)
        assert op.format == "hyb"
        assert op.fwd.ell.well is not None

    def test_astype_preserves_well(self, rng):
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = self._banded_random(rng, 512, 5, 30)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float64)
        assert op.fwd.well is not None
        op32 = op.astype(jnp.float32)
        assert op32.fwd.well is not None
        assert op32.fwd.well.values.dtype == jnp.float32
        assert op32.fwd.well.w == op.fwd.well.w

    def test_ell_pytree_roundtrip(self, rng):
        # well rides the pytree through jit
        import jax
        from rails_tpu.sparse.formats import sparse_from_scipy
        a = self._banded_random(rng, 512, 5, 30)
        op = sparse_from_scipy(a, fmt="ell")
        x = jnp.asarray(rng.uniform(-1, 1, (512, 3)))
        y = jax.jit(lambda o, v: o.matmat(v))(op, x)
        assert np.allclose(np.asarray(y), a @ np.asarray(x), atol=1e-10)


class TestWideSpmm:
    """Dense-window MXU kernel for wide multivectors
    (rails_tpu/sparse/wide_spmm.py, VERDICT r04 item 4): the gather
    kernel's escape route at s >= 64, probed live in round 4
    (ell_spmm.py docstring route 3)."""

    @staticmethod
    def _banded(rng, m, ell_l, band):
        return TestEllSpmmKernel._banded_random(rng, m, ell_l, band)

    def test_build_and_interpreter_matches(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from rails_tpu.sparse.formats import sparse_from_scipy
        from rails_tpu.sparse.wide_spmm import wide_spmm_t

        m, s = 512, 64
        a = self._banded(rng, m, 4, 32)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32,
                               wide_s=True)
        wide = op.fwd.wide
        assert wide is not None and wide.passes == 3
        x = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = wide_spmm_t(wide, x.T).T
        ref = a @ np.asarray(x)
        scale = np.abs(ref).max()
        # 3-pass bf16: ~2^-17 split residual per operand (~1.5e-5 rel)
        assert np.allclose(np.asarray(y), ref, atol=8e-5 * scale)

    def test_six_pass_is_f32_grade(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from rails_tpu.sparse.formats import sparse_from_scipy
        from rails_tpu.sparse.wide_spmm import (build_wide_window,
                                                wide_spmm_t)

        m, s = 512, 72
        a = self._banded(rng, m, 5, 40)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        wide6 = build_wide_window(op.fwd.well, passes=6)
        assert wide6 is not None and wide6.passes == 6
        x = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = wide_spmm_t(wide6, x.T).T
        ref = a @ np.asarray(x)
        scale = np.abs(ref).max()
        assert np.allclose(np.asarray(y), ref, atol=5e-7 * scale)

    def test_odd_widths_padded(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from rails_tpu.sparse.formats import sparse_from_scipy
        from rails_tpu.sparse.wide_spmm import wide_spmm_t

        m, s = 512, 67  # not a vreg-row multiple
        a = self._banded(rng, m, 4, 32)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32,
                               wide_s=True)
        x = jnp.asarray(rng.uniform(-1, 1, (m, s)), dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = wide_spmm_t(op.fwd.wide, x.T).T
        assert y.shape == (m, s)
        ref = a @ np.asarray(x)
        assert np.allclose(np.asarray(y), ref,
                           atol=8e-5 * np.abs(ref).max())

    def test_dispatch_gating(self, rng):
        """wide_spmm declines off-TPU, for narrow operands, and for
        payloads without the wide window - the callers fall through to
        the gather/XLA paths."""
        from rails_tpu.sparse.formats import sparse_from_scipy
        from rails_tpu.sparse.wide_spmm import wide_spmm

        m = 512
        a = self._banded(rng, m, 4, 32)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32,
                               wide_s=True)
        x = jnp.asarray(rng.uniform(-1, 1, (m, 64)), dtype=jnp.float32)
        assert wide_spmm(op.fwd, x) is None  # cpu backend
        bare = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        assert bare.fwd.wide is None

    def test_bytes_cap_refuses(self, rng):
        from rails_tpu.sparse.formats import sparse_from_scipy
        from rails_tpu.sparse.wide_spmm import build_wide_window

        a = self._banded(rng, 512, 4, 32)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
        assert build_wide_window(op.fwd.well, bytes_cap=1000) is None

    def test_pytree_roundtrip(self, rng):
        from rails_tpu.sparse.formats import sparse_from_scipy

        a = self._banded(rng, 512, 4, 32)
        op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32,
                               wide_s=True)
        leaves, treedef = jax.tree_util.tree_flatten(op)
        op2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert op2.fwd.wide is not None
        assert op2.fwd.wide.w == op.fwd.wide.w


class TestHubSplit:
    """Hub-splitting for power-law sparsity (rails_tpu/sparse/hub.py,
    VERDICT r04 item 5): dense MXU hub rows + compact-window hub
    columns + windowized bulk."""

    @staticmethod
    def _superhub(rng, m=1024, ell_l=4, band=24, n_hubs=8, hub_deg=200):
        """Banded bulk plus a few superhub rows/columns - the realistic
        scale-free-with-locality class the split targets."""
        a = TestEllSpmmKernel._banded_random(rng, m, ell_l, band).tolil()
        hubs = rng.choice(m, n_hubs, replace=False)
        for hb in hubs:
            cols = rng.choice(m, hub_deg, replace=False)
            vals = rng.uniform(-1, 1, hub_deg)
            a[hb, cols] = vals
            a[cols, hb] = vals * 0.5    # hub columns too (nonsymmetric)
        return a.tocsr()

    def test_matches_scipy(self, rng):
        from rails_tpu.sparse.hub import hub_operator

        a = self._superhub(rng)
        op = hub_operator(a, max_hubs=16, degree_factor=6.0)
        assert op.hub_idx.shape[0] > 0
        assert op.rest.well is not None  # bulk windowizes
        x = jnp.asarray(rng.uniform(-1, 1, (a.shape[0], 5)))
        np.testing.assert_allclose(np.asarray(op.matmat(x)),
                                   a @ np.asarray(x), atol=1e-11)
        np.testing.assert_allclose(np.asarray(op.rmatmat(x)),
                                   a.T @ np.asarray(x), atol=1e-11)

    def test_symmetric_reuses_split(self, rng):
        from rails_tpu.sparse.hub import hub_operator

        a = self._superhub(rng)
        a = (a + a.T).tocsr()
        op = hub_operator(a, max_hubs=16, degree_factor=6.0)
        assert op.is_symmetric and op.bwd is None
        x = jnp.asarray(rng.uniform(-1, 1, (a.shape[0], 3)))
        np.testing.assert_allclose(np.asarray(op.rmatmat(x)),
                                   a.T @ np.asarray(x), atol=1e-11)

    def test_under_jit_as_argument(self, rng):
        from rails_tpu.sparse.hub import hub_operator

        a = self._superhub(rng)
        op = hub_operator(a, max_hubs=16, degree_factor=6.0)
        x = jnp.asarray(rng.uniform(-1, 1, (a.shape[0], 4)))
        y = jax.jit(lambda o, z: o.matmat(z))(op, x)
        np.testing.assert_allclose(np.asarray(y), a @ np.asarray(x),
                                   atol=1e-11)

    def test_solver_hosts_hub_operator(self, rng):
        """The solver runs on a hub-split A (backend-contract check)."""
        import rails_tpu
        from rails_tpu.sparse.hub import hub_operator

        a = self._superhub(rng, m=512, n_hubs=4, hub_deg=80)
        a = (a + a.T).tolil()
        a.setdiag(a.diagonal() - np.abs(a).sum(axis=1).A1 - 1.0)
        op = hub_operator(a.tocsr(), max_hubs=8, degree_factor=6.0)
        b = jnp.asarray(rng.uniform(0, 1, (512, 2)))
        v, t, info = rails_tpu.solve(op, b, tol=1e-6, maxit=150)
        assert info.converged
        x_full = np.asarray(v) @ np.asarray(t) @ np.asarray(v).T
        r = a.tocsr() @ x_full + x_full @ a.tocsr().T \
            + np.asarray(b) @ np.asarray(b).T
        r0 = np.linalg.norm(np.asarray(b).T @ np.asarray(b), 2)
        assert np.linalg.norm(r, 2) / r0 < 1e-5

    def test_ba_coverage_is_sqrt_bounded(self, rng):
        """Pure Barabasi-Albert: hub coverage of a w-bounded set is
        ~sqrt(w/m) - the recorded reason no VMEM-window split pays
        there (module docstring; probe_hub_ba.py at m=2^20)."""
        from rails_tpu.sparse.hub import hub_coverage

        m, k = 4096, 4
        # preferential attachment via the repeated-endpoint trick
        targets = list(range(k))
        ends = []
        for v in range(k, m):
            picks = rng.choice(targets, k, replace=False)
            for u in picks:
                ends += [v, u]
            targets += [v] * k + list(picks)
        e = np.asarray(ends).reshape(-1, 2)
        a = sp.coo_matrix((np.ones(len(e)), (e[:, 0], e[:, 1])),
                          shape=(m, m)).tocsr()
        a = a + a.T
        cov = hub_coverage(a, 128)
        # sqrt(w/m) ~ 0.18 at w=128/m=4096; allow the finite-size bump
        assert cov < 0.45, cov


class TestReorder:
    """RCM bandwidth reduction -> DIA-kernel-friendly structure (TPU-native
    enhancement; no reference analogue, see rails_tpu/sparse/reorder.py)."""

    def test_rcm_recovers_banded_structure(self, rng):
        from rails_tpu.sparse.reorder import (
            bandwidth, n_diagonals, permute_system, rcm_permutation)

        n = 256
        a0 = sp.csr_matrix(laplacian2(n))
        shuffle = rng.permutation(n)
        a = a0[shuffle][:, shuffle].tocsr()
        assert bandwidth(a) > 100  # scrambled
        perm = rcm_permutation(a)
        a2, _, _ = permute_system(a, None, None, perm)
        assert bandwidth(a2) <= 2 * int(np.sqrt(n)) + 2
        assert n_diagonals(a2) < n_diagonals(a)

    def test_permuted_solve_matches(self, rng):
        from rails_tpu.sparse.reorder import permute_system, rcm_permutation

        n = 64
        a0 = sp.csr_matrix(laplacian2(n))
        md = rng.uniform(0.5, 1.5, n)
        b = rng.uniform(0, 1, (n, 1))
        shuffle = rng.permutation(n)
        a = a0[shuffle][:, shuffle].tocsr()
        m = sp.diags(md[shuffle]).tocsr()
        bp = b[shuffle]

        perm = rcm_permutation(a)
        a2, m2, b2 = permute_system(a, m, bp, perm)
        v, t, info = rails_tpu.solve(
            sparse_from_scipy(a2, is_symmetric=True), jnp.asarray(b2),
            rails_tpu.DiagonalOperator(jnp.asarray(m2.diagonal())),
            tol=1e-6)
        assert info.converged
        # map back: X = P' X_perm P
        inv = np.argsort(perm)
        x_orig = (np.asarray(v) @ np.asarray(t) @ np.asarray(v).T)[
            np.ix_(inv, inv)]
        r = a.toarray() @ x_orig @ m.toarray().T \
            + m.toarray() @ x_orig @ a.toarray().T + bp @ bp.T
        assert np.linalg.norm(r, 2) / np.linalg.norm(bp.T @ bp, 2) < 1e-6
