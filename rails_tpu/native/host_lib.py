"""ctypes bindings to the native host library (librails_host.so).

The native side provides the runtime pieces the reference implements in
C/C++/Fortran: fast MatrixMarket parsing (EpetraExt I/O role), CSR
utilities, and a serial sparse LU (the Amesos/KLU role,
/root/reference/src/SchurOperator.cpp:177-186).  Pure-Python fallbacks
exist for every entry point; ``available()`` reports whether the compiled
library is loadable (it is built on demand by rails_tpu.native.build).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "librails_host.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        from rails_tpu.native.build import build_library
        try:
            build_library()
        except Exception:
            return None
    try:
        _LIB = ctypes.CDLL(path)
        _configure(_LIB)
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _configure(lib):
    import numpy as np  # noqa: F401

    c_int64_p = ctypes.POINTER(ctypes.c_int64)
    c_double_p = ctypes.POINTER(ctypes.c_double)

    lib.rails_mm_read_header.argtypes = [
        ctypes.c_char_p, c_int64_p, c_int64_p, c_int64_p, c_int64_p]
    lib.rails_mm_read_header.restype = ctypes.c_int
    lib.rails_mm_read_coo.argtypes = [
        ctypes.c_char_p, c_int64_p, c_int64_p, c_double_p, ctypes.c_int64]
    lib.rails_mm_read_coo.restype = ctypes.c_int64

    lib.rails_splu_factor.argtypes = [
        ctypes.c_int64, c_int64_p, c_int64_p, c_double_p]
    lib.rails_splu_factor.restype = ctypes.c_void_p
    lib.rails_splu_solve.argtypes = [
        ctypes.c_void_p, c_double_p, ctypes.c_int64, ctypes.c_int]
    lib.rails_splu_solve.restype = ctypes.c_int
    lib.rails_splu_free.argtypes = [ctypes.c_void_p]
    lib.rails_splu_free.restype = None


def read_matrix_market(path: str):
    """Native MatrixMarket reader; returns scipy csr / ndarray or None to
    fall back to scipy.io."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    import scipy.sparse as sp

    rows = np.zeros(1, dtype=np.int64)
    cols = np.zeros(1, dtype=np.int64)
    nnz = np.zeros(1, dtype=np.int64)
    symmetric = np.zeros(1, dtype=np.int64)
    rc = lib.rails_mm_read_header(
        path.encode(),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        symmetric.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None  # dense/array or unsupported variant -> scipy fallback
    n = int(nnz[0])
    ii = np.empty(n, dtype=np.int64)
    jj = np.empty(n, dtype=np.int64)
    vv = np.empty(n, dtype=np.float64)
    got = lib.rails_mm_read_coo(
        path.encode(),
        ii.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        jj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    if got != n:
        return None
    a = sp.coo_matrix((vv, (ii, jj)), shape=(int(rows[0]), int(cols[0])))
    if symmetric[0]:
        off = sp.triu(a, k=1) + sp.tril(a, k=-1)
        a = a + off.T
    return a.tocsr()


class NativeSparseLU:
    """Serial sparse LU (Gilbert-Peierls with partial pivoting) - the
    Amesos/KLU role for the Schur path's A11 solve."""

    def __init__(self, csr):
        import numpy as np
        import scipy.sparse as sp

        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        csc = sp.csc_matrix(csr)
        self.n = csc.shape[0]
        self._indptr = np.ascontiguousarray(csc.indptr, dtype=np.int64)
        self._indices = np.ascontiguousarray(csc.indices, dtype=np.int64)
        self._data = np.ascontiguousarray(csc.data, dtype=np.float64)
        self._handle = lib.rails_splu_factor(
            self.n,
            self._indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if not self._handle:
            raise RuntimeError("native sparse LU factorization failed")
        self._lib = lib

    def solve(self, b, trans: bool = False):
        import numpy as np

        b = np.asarray(b, dtype=np.float64)
        shape = b.shape
        cols = b.reshape(self.n, -1)
        out = np.ascontiguousarray(cols.T.reshape(-1))  # column blocks
        rc = self._lib.rails_splu_solve(
            self._handle,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cols.shape[1], 1 if trans else 0)
        if rc != 0:
            raise RuntimeError("native sparse LU solve failed")
        return out.reshape(cols.shape[1], self.n).T.reshape(shape)

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.rails_splu_free(self._handle)
            self._handle = None
