"""ctypes bridge to the native MILU preconditioner (libmilu.so).

The analog of the reference's mrilucpp handle-based bridge
(reference src/mrilucpp/mrilucpp.F90:120-265: create/set_params/
factor/apply/destroy on integer handles, wrapped by
Ifpack_MRILU.h:37-60).  The shared library is built on demand from
``native/milu.cpp`` with g++ (no pip deps).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = os.path.join(_NATIVE_DIR, "libmilu.so")
        src = os.path.join(_NATIVE_DIR, "milu.cpp")
        # Rebuild whenever the .so is missing or the source content
        # changed (content hash, not mtimes — a fresh clone has
        # arbitrary mtimes and must never load a stale/foreign binary).
        import hashlib
        with open(src, "rb") as f:
            want = hashlib.sha256(f.read()).hexdigest()
        stamp = os.path.join(_NATIVE_DIR, ".milu.sha256")
        have = None
        if os.path.exists(stamp):
            with open(stamp) as f:
                have = f.read().strip()
        if not os.path.exists(so) or have != want:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
            with open(stamp, "w") as f:
                f.write(want)
        lib = ctypes.CDLL(so)
        lib.milu_factor.restype = ctypes.c_int64
        lib.milu_factor.argtypes = [
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.milu_solve.restype = ctypes.c_int32
        lib.milu_solve.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int32]
        lib.milu_levels.restype = ctypes.c_int32
        lib.milu_levels.argtypes = [ctypes.c_int64]
        lib.milu_destroy.restype = None
        lib.milu_destroy.argtypes = [ctypes.c_int64]
        lib.milu_gmres.restype = ctypes.c_int32
        lib.milu_gmres.argtypes = [
            ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double)]
        _LIB = lib
        return lib


class MILU:
    """Factored multilevel ILU preconditioner (RAII over the handle)."""

    def __init__(self, data, indices, indptr, *, droptol: float = 1e-3,
                 dominance: float = 0.1, max_levels: int = 12,
                 min_coarse: int = 64, use_cmk: bool = True):
        lib = _load()
        data = np.ascontiguousarray(data, np.float64)
        indices = np.ascontiguousarray(indices, np.int32)
        indptr = np.ascontiguousarray(indptr, np.int64)
        self.n = len(indptr) - 1
        self._csr = (data, indices, indptr)   # kept for the gmres driver
        self._handle = lib.milu_factor(
            self.n, indptr, indices, data,
            float(droptol), float(dominance),
            int(max_levels), int(min_coarse), int(bool(use_cmk)))
        if self._handle == 0:
            raise RuntimeError("milu_factor failed")
        self.levels = int(lib.milu_levels(self._handle))

    def gmres(self, b: np.ndarray, *, tol: float = 1e-8,
              maxiter: int = 500, restart: int = 30,
              x0: np.ndarray | None = None):
        """Native right-preconditioned restarted GMRES on the factored
        matrix — the MRILU solver-driver analog (mrilu/precon/
        gmres.F90).  Returns (x, iters, relres)."""
        lib = _load()
        data, indices, indptr = self._csr
        b = np.ascontiguousarray(b, np.float64).reshape(-1)
        if b.shape[0] != self.n:
            raise ValueError(f"size mismatch: {b.shape[0]} != {self.n}")
        x = (np.zeros_like(b) if x0 is None
             else np.ascontiguousarray(x0, np.float64).copy())
        relres = ctypes.c_double(0.0)
        it = lib.milu_gmres(self._handle, self.n, indptr, indices, data,
                            b, x, float(tol), int(maxiter), int(restart),
                            ctypes.byref(relres))
        if it < 0:
            raise RuntimeError("milu_gmres: bad handle")
        return x, int(it), float(relres.value)

    def solve(self, b: np.ndarray) -> np.ndarray:
        lib = _load()
        b = np.ascontiguousarray(b, np.float64).reshape(-1)
        if b.shape[0] != self.n:
            raise ValueError(f"size mismatch: {b.shape[0]} != {self.n}")
        x = np.empty_like(b)
        rc = lib.milu_solve(self._handle, b, x, self.n)
        if rc:
            raise RuntimeError("milu_solve: bad handle")
        return x

    def __del__(self):
        try:
            if getattr(self, "_handle", 0):
                _load().milu_destroy(self._handle)
        except Exception:
            pass


def factor(data, indices, indptr, *, droptol: float = 1e-3,
           max_levels: int = 12, fill_factor: float = 10.0,
           dominance: float = 0.1) -> MILU:
    """Functional entry used by the SolverFactory (fill_factor accepted
    for interface parity; dropping is tolerance-based)."""
    return MILU(data, indices, indptr, droptol=droptol,
                dominance=dominance, max_levels=max_levels)


def solve(fac: MILU, b: np.ndarray) -> np.ndarray:
    return fac.solve(b)
