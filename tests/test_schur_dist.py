"""Distributed Schur path (VERDICT r04 item 1): the reference's
production configuration - an MPI solve on the SchurOperator
(/root/reference/src/main.cpp:78-98, SchurOperator.cpp:201-233) - as a
mesh-placed operator (parallel/schur_dist.py).  Oracles: the host-side
SchurReduction operator and true residuals in the reduced space."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import rails_tpu
from rails_tpu.parallel.mesh import make_mesh, row_sharding
from rails_tpu.parallel.schur_dist import (
    DistributedSchurOperator,
    distribute_schur,
)
from rails_tpu.schur import schur_reduce


def _dae_problem(n, n1, seed=0, p=2):
    """Random index-1 DAE: sparse diagonally-dominant A, diagonal M with
    ``n1`` zero entries (the make_problem 'dae' generator shape,
    rails_tpu/models/make_problem.py)."""
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, (n, n)) * (rng.uniform(0, 1, (n, n)) < 0.25)
    a = sp.csr_matrix(a - 3.0 * np.eye(n))
    mdiag = rng.uniform(0.5, 1.5, n)
    mdiag[rng.permutation(n)[:n1]] = 0.0
    m = sp.diags(mdiag).tocsr()
    b = rng.uniform(-1, 1, (n, p))
    b[mdiag == 0] = 0.0
    return a, m, b


def test_distributed_apply_matches_host():
    """matmat/rmatmat of the mesh operator == the host SchurReduction
    operator (n2 = 64 divisible by 8: the shard_map scatter path)."""
    a, m, b = _dae_problem(96, 32)
    red = schur_reduce(a, m, b)
    assert red.n2 == 64
    mesh = make_mesh(8)
    op = distribute_schur(red, mesh)
    assert isinstance(op, DistributedSchurOperator)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (red.n2, 5)))
    y = np.asarray(op.matmat(x))
    y_ref = np.asarray(red.operator.matmat(x))
    np.testing.assert_allclose(y, y_ref, atol=1e-11)
    yt = np.asarray(op.rmatmat(x))
    yt_ref = np.asarray(red.operator.rmatmat(x))
    np.testing.assert_allclose(yt, yt_ref, atol=1e-11)


def test_pad_system_for_uneven_n2():
    """n2 not divisible by the mesh: distribute_schur refuses with a
    clear message (JAX shardings reject uneven slabs), and pad_system
    makes the geometry fit without changing the solution - the padded
    rows are decoupled stable dynamics with zero forcing."""
    from rails_tpu.parallel.schur_dist import pad_system

    a, m, b = _dae_problem(71, 30, seed=3)
    red = schur_reduce(a, m, b)
    assert red.n2 % 8 != 0
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="pad the system"):
        distribute_schur(red, mesh)
    a_p, m_p, b_p, pad = pad_system(a, m, b, 8)
    assert pad == (-red.n2) % 8
    red_p = schur_reduce(a_p, m_p, b_p)
    assert red_p.n2 % 8 == 0
    op = distribute_schur(red_p, mesh)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (red_p.n2, 3))
    x[red.n2:] = 0.0  # probe in the original subspace
    y = np.asarray(op.matmat(jnp.asarray(x)))
    y_ref = np.asarray(red.operator.matmat(jnp.asarray(x[:red.n2])))
    np.testing.assert_allclose(y[:red.n2], y_ref, atol=1e-11)
    np.testing.assert_allclose(y[red.n2:], -x[red.n2:], atol=1e-13)


def test_distributed_apply_inside_jit():
    """The operator rides through jit as a pytree argument (the solver
    engines pass payloads as args, core/solver.py _ops_tuple)."""
    a, m, b = _dae_problem(96, 32, seed=5)
    red = schur_reduce(a, m, b)
    mesh = make_mesh(8)
    op = distribute_schur(red, mesh)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (red.n2, 4)))
    y = np.asarray(jax.jit(lambda o, z: o.matmat(z))(op, x))
    np.testing.assert_allclose(y, np.asarray(red.operator.matmat(x)),
                               atol=1e-11)


def test_nonsingular_m_degenerates_to_shard_operator():
    """n1 = 0: distribute_schur returns the plain sharded A22 = A."""
    a, m, b = _dae_problem(64, 0, seed=7)
    red = schur_reduce(a, m, b)
    mesh = make_mesh(8)
    op = distribute_schur(red, mesh)
    assert not isinstance(op, DistributedSchurOperator)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (64, 3)))
    np.testing.assert_allclose(np.asarray(op.matmat(x)),
                               np.asarray(red.operator.matmat(x)),
                               atol=1e-11)


def test_distributed_solve_matches_single():
    """Full solve on the mesh-placed Schur operator: converges with the
    same iteration count as the single-controller Schur solve, and the
    true reduced-space residual meets the tolerance (the MOC-style
    oracle, matlab/test/test_MOC.m:26-35)."""
    a, m, b = _dae_problem(96, 32)
    red = schur_reduce(a, m, b)
    kw = dict(tol=1e-8, maxit=120, seed=1)
    v1, t1, info1 = rails_tpu.solve(red.operator, jnp.asarray(red.bs),
                                    red.ms, **kw)
    assert info1.converged
    mesh = make_mesh(8)
    op = distribute_schur(red, mesh)
    solver = rails_tpu.LyapunovSolver(op, jnp.asarray(red.bs), red.ms,
                                      mesh=mesh, **kw)
    v2, t2, info2 = solver.solve()
    assert info2.converged
    assert info2.iter == info1.iter
    # true residual: S X Ms + Ms X S' + Bs Bs', Frobenius, via host dense
    s_dense = np.asarray(red.operator.matmat(jnp.eye(red.n2)))
    msd = np.asarray(red.ms_diag)
    v_h = np.asarray(v2)
    x_full = v_h @ np.asarray(t2) @ v_h.T
    r = s_dense @ x_full @ np.diag(msd) \
        + np.diag(msd) @ x_full @ s_dense.T \
        + np.asarray(red.bs) @ np.asarray(red.bs).T
    r0 = np.linalg.norm(np.asarray(red.bs).T @ np.asarray(red.bs), 2)
    assert np.linalg.norm(r, "fro") / r0 < 1e-6


def test_distributed_solve_compiled_while_loop():
    """The compiled=True single-while_loop path accepts the operator."""
    a, m, b = _dae_problem(96, 32, seed=9)
    red = schur_reduce(a, m, b)
    mesh = make_mesh(8)
    op = distribute_schur(red, mesh)
    solver = rails_tpu.LyapunovSolver(op, jnp.asarray(red.bs), red.ms,
                                      mesh=mesh, tol=1e-6, maxit=100)
    v, t, info = solver.solve(compiled=True)
    assert info.converged


def test_distribute_schur_requires_dense_lu():
    a, m, b = _dae_problem(96, 32)
    red = schur_reduce(a, m, b, a11_solver="iterative")
    with pytest.raises(ValueError, match="dense-LU"):
        distribute_schur(red, make_mesh(8))


def test_eigs_mesh_matches_host(rng):
    """Distributed post-processing (VERDICT r04 item 8): eigs over a
    row-sharded low-rank solution operator matches the replicated host
    path - no V gather (the reference's Anasazi eigensolve runs on the
    distributed operator, /root/reference/src/main.cpp:140-170)."""
    from rails_tpu.eigs import eigs
    from rails_tpu.operators import CallableOperator, LowRankOperator

    m_rows, k = 256, 12
    v, _ = np.linalg.qr(rng.standard_normal((m_rows, k)))
    lam = np.linspace(3.0, 0.5, k)
    t = np.diag(lam)
    # host path
    v_h, t_h = jnp.asarray(v), jnp.asarray(t)
    sop_h = CallableOperator(lambda x: v_h @ (t_h @ (v_h.T @ x)),
                             (m_rows, m_rows), is_symmetric=True)
    e_h, _ = eigs(sop_h, num=5, tol=1e-10)
    # sharded path
    mesh = make_mesh(8)
    v_sh = jax.device_put(v_h, row_sharding(mesh))
    sop_d = LowRankOperator(v_sh @ t_h, v_sh)
    e_d, vec_d = eigs(sop_d, num=5, tol=1e-10, mesh=mesh)
    np.testing.assert_allclose(np.asarray(e_d), np.asarray(e_h),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(e_d), lam[:5], rtol=1e-9)
    # the returned Ritz basis is row-sharded (never gathered)
    assert not vec_d.sharding.is_fully_replicated
