"""Sharding placement for operators and solver state.

``shard_operator`` / ``shard_state`` lay out the solve over a 1-D mesh
(see mesh.py for the design rationale).  After placement, the *same*
jitted iteration runs unchanged: GSPMD turns the Gram contractions into
local-GEMM + psum and the SpMM shifts into neighbor collectives - the
reference's entire Epetra communication inventory
(/root/reference/src/Epetra_MultiVectorWrapper.cpp:418-438,
SchurOperator.cpp:132-153) becomes sharding annotations.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from rails_tpu.operators import (
    CallableOperator,
    DenseOperator,
    DiagonalOperator,
    IdentityOperator,
    LinearOperator,
)
from rails_tpu.parallel.mesh import col_sharding, replicated, row_sharding
from rails_tpu.sparse.formats import (
    DiaMatrix,
    EllMatrix,
    HybMatrix,
    SparseOperator,
)

__all__ = ["shard_operator", "shard_state", "shard_array_rows"]


def shard_array_rows(x, mesh: Mesh):
    return jax.device_put(x, row_sharding(mesh))


def _shard_payload(payload, mesh):
    if isinstance(payload, DiaMatrix):
        return DiaMatrix(jax.device_put(payload.data, col_sharding(mesh)),
                         payload.offsets, payload.shape)
    if isinstance(payload, EllMatrix):
        return EllMatrix(jax.device_put(payload.indices, row_sharding(mesh)),
                         jax.device_put(payload.values, row_sharding(mesh)),
                         payload.shape)
    if isinstance(payload, HybMatrix):
        return HybMatrix(_shard_payload(payload.dia, mesh),
                         _shard_payload(payload.ell, mesh), payload.shape)
    raise TypeError(type(payload))


def shard_operator(op: LinearOperator, mesh: Mesh,
                   spmm: str = "auto") -> LinearOperator:
    """Place an operator's payload row-sharded on the mesh.

    ``spmm`` picks the distributed SpMM strategy for DIA payloads:
    'halo' routes applies through the explicit-halo shard_map operator
    (ppermute neighbor exchange overlapping a per-chip Pallas kernel -
    the reference's Epetra Apply pattern,
    /root/reference/src/Epetra_OperatorWrapper.cpp:75-91), 'gspmd'
    leaves communication to the partitioner (Pallas disabled), 'auto'
    uses halo whenever the slab geometry allows.
    """
    if spmm not in ("auto", "halo", "gspmd"):
        raise ValueError(f"unknown spmm strategy {spmm!r}")
    if isinstance(op, DenseOperator):
        return DenseOperator(
            jax.device_put(op.a, row_sharding(mesh)),
            is_symmetric=op.is_symmetric, is_spd=op.is_spd,
            is_hurwitz=op.is_hurwitz)
    if isinstance(op, DiagonalOperator):
        return DiagonalOperator(
            jax.device_put(op.d, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("rows"))),
            is_spd=op.is_spd)
    if isinstance(op, SparseOperator):
        if spmm != "gspmd" and isinstance(op.fwd, DiaMatrix):
            from rails_tpu.parallel.halo_spmm import (
                HaloDiaOperator, halo_geometry_ok)
            bwd_ok = op.bwd is None or isinstance(op.bwd, DiaMatrix)
            if bwd_ok and halo_geometry_ok(op.fwd, mesh) and (
                    op.bwd is None or halo_geometry_ok(op.bwd, mesh)):
                return HaloDiaOperator(
                    op.fwd, mesh, op.bwd,
                    is_symmetric=op.is_symmetric, is_spd=op.is_spd,
                    is_hurwitz=op.is_hurwitz)
            if spmm == "halo":
                raise ValueError(
                    "spmm='halo' requires a square DIA payload with rows "
                    "divisible by the mesh and stencil span within one "
                    "per-device slab")
        bwd = None if op.bwd is None else _shard_payload(op.bwd, mesh)
        return SparseOperator(
            _shard_payload(op.fwd, mesh), bwd,
            is_symmetric=op.is_symmetric, is_spd=op.is_spd,
            is_hurwitz=op.is_hurwitz, nnz=op.nnz, use_pallas=False)
    if isinstance(op, (CallableOperator, IdentityOperator)):
        return op
    raise TypeError(f"cannot shard operator of type {type(op)}")


def shard_state(state, mesh: Mesh):
    """Row-shard the m-sized buffers; replicate everything else
    (the reference's distributed-V / replicated-T split,
    SURVEY.md section 2.7)."""
    rows = row_sharding(mesh)
    rep = replicated(mesh)

    def place(x, sh):
        return None if x is None else jax.device_put(x, sh)

    return state._replace(
        V=place(state.V, rows), AV=place(state.AV, rows),
        MV=place(state.MV, rows), q_warm=place(state.q_warm, rows),
        BV=place(state.BV, rep), VAV=place(state.VAV, rep),
        VBV=place(state.VBV, rep), VMV=place(state.VMV, rep),
        T=place(state.T, rep),
    )
