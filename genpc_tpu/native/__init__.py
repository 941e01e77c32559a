"""ctypes bindings for the C++ host ops (builds on first import if needed).

The shared library is optional: every caller has a numpy fallback.  Build
explicitly with ``make -C genpc_tpu/native`` or let this module attempt a
one-time build when g++ is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhost_ops.so")
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            raise ImportError(f"native host_ops unavailable: {e}")
    lib = ctypes.CDLL(_SO)
    lib.fps_sample.restype = ctypes.c_int
    lib.fps_sample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    _LIB = lib
    return lib


def fps_sample_native(points: np.ndarray, k: int, start: int = 0
                      ) -> np.ndarray:
    """Host FPS indices (fpsample equivalent)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.zeros(k, np.int64)
    ret = lib.fps_sample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts), k, start,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if ret != 0:
        raise ValueError("fps_sample failed (check k <= n)")
    return out


def voxel_down_sample_native(points: np.ndarray, voxel_size: float,
                             colors: Optional[np.ndarray] = None
                             ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float64)
    n = len(pts)
    out_p = np.zeros((n, 3), np.float64)
    if colors is not None:
        cols = np.ascontiguousarray(colors, np.float64)
        out_c = np.zeros((n, 3), np.float64)
        c_ptr = cols.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        oc_ptr = out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        out_c = None
        c_ptr = None
        oc_ptr = None
    m = lib.voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), c_ptr, n,
        float(voxel_size),
        out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), oc_ptr)
    if m < 0:
        raise ValueError("voxel_downsample failed")
    op = out_p[:m].astype(np.asarray(points).dtype)
    oc = None
    if colors is not None:
        oc = out_c[:m].astype(np.asarray(colors).dtype)
    return op, oc
