"""Multi-host (pod-slice) scaffolding.

The reference scales across nodes with MPI ranks (mpirun + Epetra maps);
the JAX equivalent is multi-controller SPMD: one process per host, each
seeing its local devices, with `jax.distributed.initialize` wiring the
global view.  Everything else in rails_tpu is already multi-host ready:
the 1-D rows mesh spans all global devices, shard_operator/shard_state
place global arrays, and GSPMD emits ICI/DCN collectives.

This module adds the two missing conveniences:

- ``initialize(...)``: thin wrapper over jax.distributed.initialize with
  env-var defaults (a no-op on single-process runs);
- ``make_global_array(local_rows, mesh)``: assemble a row-sharded global
  array from per-host row slabs without materializing the whole matrix
  on any host (jax.make_array_from_process_local_data) - the analogue of
  Epetra's distributed MatrixMarket loading (EpetraExt
  MatrixMarketFileToCrsMatrix, /root/reference/src/main.cpp:66-68).

Not exercised in CI (single host); the sharded code paths it feeds are
tested on the 8-device simulated mesh every run.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from rails_tpu.parallel.mesh import ROW_AXIS, make_mesh, row_sharding

__all__ = ["initialize", "make_global_array"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults; no-op if
    single-process or already initialized."""
    if num_processes is None:
        num_processes = int(os.environ.get("RAILS_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("RAILS_COORDINATOR"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("RAILS_PROCESS_ID", "0")))


def make_global_array(local_rows, mesh=None):
    """Assemble a row-sharded global array from this process's row slab."""
    if mesh is None:
        mesh = make_mesh()
    return jax.make_array_from_process_local_data(
        row_sharding(mesh), local_rows)
