"""Large-scale symmetric eigensolver - the Anasazi BlockKrylovSchur role.

The reference computes the dominant eigenpairs of the (symmetric) solution
operator with Anasazi's block Krylov-Schur
(/root/reference/src/Epetra_OperatorWrapper.cpp:147-222), dropping
eigenvalues below a tolerance; MATLAB uses ARPACK ``eigs`` on the residual
operator (RAILSsolver.m:392-394).  The TPU-native equivalent is
thick-restarted Lanczos with full reorthogonalization: a fixed-size
Krylov sweep is one jitted ``lax.scan`` (m-sized GEMV + small dense ops),
restarts keep the leading Ritz vectors, and convergence is checked on the
host between sweeps.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.operators import CallableOperator, LinearOperator
from rails_tpu.utils.dtypes import highest_precision

__all__ = ["eigs"]


def _as_apply(op) -> Tuple[Callable, int]:
    if isinstance(op, LinearOperator):
        return op.matmat, op.shape[0]
    raise TypeError("eigs expects a LinearOperator (wrap callables with "
                    "CallableOperator)")


def eigs(
    op: LinearOperator,
    num: int = 6,
    *,
    tol: float = 1e-8,
    max_restarts: int = 100,
    subspace: Optional[int] = None,
    drop_tol: Optional[float] = None,
    key: Optional[jax.Array] = None,
    dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """Largest-|lambda| eigenpairs of a symmetric operator.

    Returns (eigenvalues, eigenvectors) sorted by |lambda| descending.
    ``drop_tol`` mirrors the reference's filtering of converged
    eigenvalues with |lambda| <= tol * |lambda_max|
    (Epetra_OperatorWrapper.cpp:205-218).
    """
    apply_op, m = _as_apply(op)
    if dtype is None:
        dtype = jnp.asarray(0.0).dtype
    if key is None:
        key = jax.random.PRNGKey(0)
    num = min(num, m)
    if subspace is None:
        subspace = min(m, max(2 * num + 10, 20))
    L = subspace
    eps = float(jnp.finfo(dtype).eps)

    @jax.jit
    @highest_precision
    def sweep(basis, nb, key):
        """Extend an orthonormal basis (m, L) holding nb valid columns by
        Lanczos-with-full-reorth until L columns; returns the projected
        matrix G = Q' A Q and the new basis."""
        def body(carry, j):
            q, key = carry
            key, sub = jax.random.split(key)
            # Krylov continuation: kept Ritz columns pass through; new
            # columns are A applied to the previous basis vector, fully
            # reorthogonalized (thick-restart Lanczos).
            prev = q[:, jnp.maximum(j - 1, 0)]
            col = jnp.where(
                j < nb, q[:, j],
                jnp.where(j == 0,
                          jax.random.normal(sub, (m,), dtype=dtype),
                          apply_op(prev[:, None])[:, 0]))
            # orthogonalize (twice) against previous columns
            mask = (jax.lax.broadcasted_iota(jnp.int32, (L,), 0) < j
                    ).astype(dtype)
            qm = q * mask[None, :]
            for _ in range(2):
                col = col - qm @ (qm.T @ col)
            nrm = jnp.linalg.norm(col)
            small = nrm < eps * 100
            col = jnp.where(small,
                            jax.random.normal(sub, (m,), dtype=dtype), col)
            for _ in range(2):
                col = col - qm @ (qm.T @ col)
            col = col / jnp.linalg.norm(col)
            q = q.at[:, j].set(col)
            return (q, key), None

        (q, key), _ = jax.lax.scan(body, (basis, key), jnp.arange(L))
        aq = apply_op(q)
        g = q.T @ aq
        g = 0.5 * (g + g.T)
        evals, evecs = jnp.linalg.eigh(g)
        order = jnp.argsort(-jnp.abs(evals))
        evals = evals[order]
        evecs = evecs[:, order]
        ritz = q @ evecs
        aritz = aq @ evecs
        resid = jnp.linalg.norm(aritz - ritz * evals[None, :], axis=0)
        return ritz, aritz, evals, resid, key

    basis = jnp.zeros((m, L), dtype=dtype)
    nb = jnp.int32(0)
    evals = None
    for restart in range(max_restarts):
        ritz, aritz, evals, resid, key = sweep(basis, nb, key)
        scale = jnp.maximum(jnp.abs(evals[0]), eps)
        conv = np.asarray(resid[:num] <= tol * scale)
        if conv.all():
            break
        # thick restart: keep the leading num + a few Ritz vectors
        keep = min(num + max(num // 2, 3), L - 2)
        basis = basis.at[:, :keep].set(ritz[:, :keep])
        nb = jnp.int32(keep)

    evals = evals[:num]
    evecs = ritz[:, :num]
    if drop_tol is not None:
        mask = np.asarray(jnp.abs(evals) > drop_tol * jnp.abs(evals[0]))
        evals = evals[mask]
        evecs = evecs[:, mask]
    return evals, evecs
