"""Native host runtime: C++ IRT kernel with ctypes bindings.

Role-parallel to the reference's MEX/CTypes layer (python/tt_irt_py/
tt_irt.py + tt_irt1_int32.c): a CPU executor for the sampling hot path,
compiled on demand with g++ (OpenMP) and loaded via ctypes.  The JAX
samplers remain the TPU path; this is the host fallback / embedding
engine and an independent implementation used for cross-validation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["tt_irt_native", "native_available", "build_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tt_irt_core.cpp")
_LIB = os.path.join(_HERE, "libttirt.so")
_LOCK = threading.Lock()
_CACHED = {"lib": None, "tried": False}


def build_native(force: bool = False) -> bool:
    """Compile the shared library with g++ (idempotent)."""
    with _LOCK:
        if os.path.exists(_LIB) and not force and \
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return True
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            _CACHED["lib"] = None
            _CACHED["tried"] = False
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False


def _load():
    with _LOCK:
        if _CACHED["lib"] is not None or _CACHED["tried"]:
            return _CACHED["lib"]
        _CACHED["tried"] = True
    if not os.path.exists(_LIB):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.tt_irt_native.restype = ctypes.c_int
    lib.tt_irt_native.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
    ]
    with _LOCK:
        _CACHED["lib"] = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def tt_irt_native(grids, tt, q, mode: str = "sqr"):
    """Run the native IRT: (grids, TT, seeds) -> (samples, log density).

    mode: 'lin' (density TT) or 'sqr' (sqrt-density TT).  Grids must
    contain the boundary points; cores missing boundaries are
    extrapolated like the JAX path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    from ..samplers.irt import _canon_grid

    gs, tt = _canon_grid(grids, tt)
    d = tt.d
    n = np.asarray(tt.n, dtype=np.int64)
    r = np.asarray(tt.ranks, dtype=np.int64)
    cores = np.concatenate(
        [np.ascontiguousarray(np.asarray(c), dtype=np.float64).ravel()
         for c in tt.cores])
    grid_cat = np.concatenate(
        [np.ascontiguousarray(np.asarray(g), dtype=np.float64)
         for g in gs])
    q = np.ascontiguousarray(np.asarray(q), dtype=np.float64)
    m = q.shape[0]
    if q.shape[1] != d:
        raise ValueError("marginal sampling not supported by the native "
                         "kernel; pass full-dimension seeds")
    x_out = np.empty((m, d), dtype=np.float64)
    lf_out = np.empty((m,), dtype=np.float64)
    code = lib.tt_irt_native(0 if mode == "lin" else 1, d, n, r,
                             cores, grid_cat, m, q, x_out, lf_out)
    if code != 0:
        raise RuntimeError(f"native kernel failed with code {code}")
    return x_out, lf_out
