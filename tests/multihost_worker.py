"""Worker for the 2-process multi-host smoke test (run via subprocess by
tests/test_multihost.py).  Each process simulates one host with 2 CPU
devices; jax.distributed wires the 4-device global view - the posture
the reference never tests (its CI never launches mpirun, SURVEY.md §4).

argv: coordinator_address process_id
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

coordinator, pid = sys.argv[1], int(sys.argv[2])

from rails_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=coordinator, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from jax.experimental import multihost_utils  # noqa: E402

from rails_tpu.parallel.halo_spmm import HaloDiaOperator  # noqa: E402
from rails_tpu.parallel.mesh import col_sharding, make_mesh  # noqa: E402
from rails_tpu.sparse.formats import DiaMatrix  # noqa: E402

mesh = make_mesh()          # all 4 global devices
m, s = 512, 3
rng = np.random.default_rng(0)      # same seed -> same global data
v_full = rng.uniform(-1, 1, (m, s))
rows_per_proc = m // 2
v_local = v_full[pid * rows_per_proc:(pid + 1) * rows_per_proc]

# 1. global array assembly from per-host slabs
v = multihost.make_global_array(jnp.asarray(v_local), mesh)
assert v.shape == (m, s)

# 2. distributed Gram (psum over hosts under GSPMD); the result is
# replicated, so every process reads its local copy
g = jax.jit(lambda x: x.T @ x)(v)
g_local = np.asarray(g.addressable_shards[0].data)
ref = v_full.T @ v_full
assert np.allclose(g_local, ref, atol=1e-12), "gram mismatch"

# 3. explicit-halo distributed SpMM across host boundaries
offsets = (-3, 0, 2)
data_full = rng.uniform(-1, 1, (len(offsets), m))
data_local = data_full[:, pid * rows_per_proc:(pid + 1) * rows_per_proc]
data = jax.make_array_from_process_local_data(
    col_sharding(mesh), jnp.asarray(data_local))
dia = DiaMatrix(data, offsets, (m, m))
# payloads already globally placed; pass the operator as a jit ARG
# (a global array may not be closed over in multi-controller jax)
op = HaloDiaOperator(dia, mesh, _placed=True, is_symmetric=True)
y = jax.jit(lambda o, x: o.matmat(x))(op, v)
y_host = np.asarray(multihost_utils.process_allgather(y, tiled=True))
# dense reference
ref_y = np.zeros((m, s))
for k, off in enumerate(offsets):
    lo, hi = max(0, -off), min(m, m - off)
    ref_y[lo:hi] += data_full[k, lo:hi, None] * v_full[lo + off:hi + off]
assert np.allclose(y_host, ref_y, atol=1e-12), "halo spmm mismatch"

if pid == 0:
    print("MULTIHOST-OK")
