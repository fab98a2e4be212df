"""Matrix I/O: MatrixMarket files and the DataErik ocean-model format.

Mirrors the reference's I/O surface:
- EpetraExt MatrixMarket load/store of A/B/M and the V/T checkpoint
  (/root/reference/src/main.cpp:62-72,123-138)
- the DataErik custom CSR-like on-disk layout (Ap1.beg/jco/co + Bp1.co +
  Frcp1.co) and its preprocessing into (A, M, B)
  (/root/reference/matlab/test/test_MOC.m:100-133)
- the nullspace border augmentation used for the MOC problem
  (matlab/test/test_MOC.m:136-160; C++ border path
  src/SchurOperator.cpp:84-91,156-173)

A fast native C parser (rails_tpu.native) is used when available; the
scipy.io fallback keeps everything working without the native build.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import scipy.io
import scipy.sparse as sp

__all__ = [
    "read_matrix_market",
    "write_matrix_market",
    "load_dataerik",
    "load_moc_problem",
    "add_border",
    "save_restart_data",
    "load_restart_data",
]

REFERENCE_DATAERIK = "/root/reference/matlab/DataErik"


def read_matrix_market(path: str):
    """Returns scipy sparse (coordinate files) or ndarray (array files)."""
    from rails_tpu.native import host_lib

    if host_lib.available():
        out = host_lib.read_matrix_market(path)
        if out is not None:
            return out
    m = scipy.io.mmread(path)
    return m.tocsr() if sp.issparse(m) else np.asarray(m)


def write_matrix_market(path: str, a, comment: str = "") -> None:
    a = sp.csr_matrix(a) if sp.issparse(a) else np.asarray(a)
    scipy.io.mmwrite(path, a, comment=comment)
    # scipy appends .mtx if missing; normalize to the exact path
    if not os.path.exists(path) and os.path.exists(path + ".mtx"):
        os.replace(path + ".mtx", path)


def load_dataerik(directory: str = REFERENCE_DATAERIK,
                  prefix: str = "Ap1", mass: str = "Bp1",
                  forcing: str = "Frcp1"):
    """Raw DataErik arrays: (A csr, diag(M), F).

    On-disk layout (matlab/test/test_MOC.m:100-123): <prefix>.beg holds
    1-based row pointers, .jco 1-based column indices, .co values;
    <mass>.co is the diagonal of M; <forcing>.co the forcing vector.
    """
    def load(name):
        return np.loadtxt(os.path.join(directory, name))

    info = load(f"{prefix}.info").astype(int).ravel()
    n, nnz = int(info[0]), int(info[1])
    beg = load(f"{prefix}.beg").astype(np.int64) - 1   # to 0-based
    jco = load(f"{prefix}.jco").astype(np.int64) - 1
    co = load(f"{prefix}.co")
    assert len(beg) == n + 1 and len(jco) == nnz
    a = sp.csr_matrix((co, jco, beg), shape=(n, n))
    mdiag = load(f"{mass}.co")
    f = load(f"{forcing}.co")
    return a, mdiag, f


def load_moc_problem(directory: str = REFERENCE_DATAERIK):
    """(A, M, B) of the MOC ocean problem after the reference's
    preprocessing (matlab/test/test_MOC.m:100-133):

    - of every 6 unknowns per grid cell, only fields 4 (temperature) and 5
      (salinity, 0-based) keep their mass-matrix entries;
    - the stochastic forcing B = 0.1 * F acts on salinity only.
    """
    a, mdiag, f = load_dataerik(directory)
    n = a.shape[0]
    j = np.arange(n)
    mdiag = mdiag.copy()
    mdiag[(j % 6) <= 3] = 0.0        # zero all but temperature/salinity
    f = f.copy()
    f[(j % 6) <= 4] = 0.0            # zero all but salinity
    b = 0.1 * f[:, None]
    m = sp.diags(mdiag).tocsr()
    return a, m, b


def moc_border(n: int) -> np.ndarray:
    """The two checkerboard nullspace border vectors of the MOC problem
    (matlab/test/test_MOC.m:136-160): pressure dofs (field 3) split by the
    parity of their horizontal cell index."""
    border = np.zeros((n, 2))
    for j in range(n):
        if j % 6 == 3:
            cell = j // 6
            if ((cell % 4) + ((cell // 4) % 16)) % 2 == 0:
                border[j, 0] = 1.0
            else:
                border[j, 1] = 1.0
    return border


def add_border(a, m, b, border) -> Tuple[sp.csr_matrix, sp.csr_matrix,
                                         np.ndarray]:
    """Append nullspace border rows/columns:
    A2 = [[A, W], [W', 0]], M2 = blkdiag(M, 0), B2 = [B; 0]
    (matlab/test/test_MOC.m:136-160; the C++ equivalently inserts the
    border into A11 during the Schur split, SchurOperator.cpp:156-173)."""
    a = sp.csr_matrix(a)
    n = a.shape[0]
    border = np.asarray(border)
    q = border.shape[1]
    a2 = sp.bmat([[a, sp.csr_matrix(border)],
                  [sp.csr_matrix(border.T), None]], format="csr")
    m2 = sp.bmat([[sp.csr_matrix(m), None],
                  [None, sp.csr_matrix((q, q))]], format="csr")
    b = np.asarray(b)
    if b.ndim == 1:
        b = b[:, None]
    b2 = np.vstack([b, np.zeros((q, b.shape[1]))])
    return a2, m2, b2


def save_restart_data(path: str, restart_data: dict) -> None:
    """Persist a solve's warm-start data ``{V, AV, VAV}`` (SolveInfo.
    restart_data) to one ``.npz`` file.

    The reference's restart_data lives only in MATLAB workspace memory
    (RAILSsolver.m:174-197); persisting it makes continuation runs
    restartable across processes/jobs - load with ``load_restart_data``
    and pass as ``SolverOptions(restart_data=...)`` (or feed
    ``ContinuationSolver``)."""
    # write through a file object: np.savez(path) silently APPENDS .npz
    # to suffix-less paths while np.load does not, breaking round-trips
    with open(path, "wb") as f:
        np.savez(f, **{k: np.asarray(v)
                       for k, v in restart_data.items()})


def load_restart_data(path: str) -> dict:
    """Load warm-start data written by ``save_restart_data``."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
