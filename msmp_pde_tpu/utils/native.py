"""ctypes bindings for the native preprocessing library (native/).

Loads ``native/libmsmp_native.so`` (built with ``make -C native``, or
auto-built on first use when g++ is available). Every entry point has a pure
numpy fallback, so the library is an optional accelerator — the test suite
asserts bit-identical results between the two paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmsmp_native.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.avg_downproject.argtypes = [f64p, f64p, i64, i64, i64, ctypes.c_int]
    lib.mean_downproject.argtypes = [f64p, f64p, i64, i64, i64]
    lib.knn_neighbors.argtypes = [f64p, i64, i64, i64, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def avg_downproject(u: np.ndarray, ratio: int, pad: str) -> np.ndarray:
    """Native path for data/dataset.py::_avg_downproject."""
    lib = _load()
    assert lib is not None
    u2 = _as_f64(u).reshape(-1, u.shape[-1])
    out = np.empty((u2.shape[0], u.shape[-1] // ratio), np.float64)
    lib.avg_downproject(
        u2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        u2.shape[0], u2.shape[1], ratio, 0 if pad == "periodic" else 1,
    )
    return out.reshape(u.shape[:-1] + (u.shape[-1] // ratio,))


def mean_downproject(u: np.ndarray, ratio: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    u2 = _as_f64(u).reshape(-1, u.shape[-1])
    out = np.empty((u2.shape[0], u.shape[-1] // ratio), np.float64)
    lib.mean_downproject(
        u2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        u2.shape[0], u2.shape[1], ratio,
    )
    return out.reshape(u.shape[:-1] + (u.shape[-1] // ratio,))


def knn_neighbors(points: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = _as_f64(points)
    if pts.ndim == 1:
        pts = pts[:, None]
    n, d = pts.shape
    idx = np.empty((n, k), np.int32)
    lib.knn_neighbors(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, d, k, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return idx
