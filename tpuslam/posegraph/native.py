"""ctypes binding for the native C++ pose-graph solver.

The native counterpart of the reference's g2o dependency (third_party/g2opy):
`native/posegraph.cc` implements LM over SE(3) with banded Cholesky +
Woodbury loop-closure corrections.  The library auto-builds with g++ on first
use (cached next to the source); `is_available()` gates callers so pure-JAX
environments still work.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libposegraph.so"
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    src = _NATIVE_DIR / "posegraph.cc"
    if not src.exists():
        return f"missing source {src}"
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
             "-o", str(_LIB_PATH), str(src)],
            check=True,
            capture_output=True,
            text=True,
        )
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or (
        _LIB_PATH.stat().st_mtime < (_NATIVE_DIR / "posegraph.cc").stat().st_mtime
    ):
        _build_error = _build()
        if _build_error is not None:
            return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pose_graph_optimize.restype = ctypes.c_int
    lib.pose_graph_optimize.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pose_graph_error.restype = ctypes.c_double
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def optimize_native(
    poses: np.ndarray,
    fixed: np.ndarray,
    edges_ij: np.ndarray,
    measurements: np.ndarray,
    information: np.ndarray,
    max_iterations: int = 25,
) -> Tuple[np.ndarray, float]:
    """Run the C++ LM solver.  Arrays: poses (N,4,4), fixed (N,), edges (M,2),
    measurements (M,4,4), information (M,6,6).  Returns (poses, error)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native solver unavailable: {_build_error}")
    poses = np.ascontiguousarray(poses, np.float64).copy()
    fixed = np.ascontiguousarray(fixed, np.uint8)
    edges_ij = np.ascontiguousarray(edges_ij, np.int32)
    measurements = np.ascontiguousarray(measurements, np.float64)
    information = np.ascontiguousarray(information, np.float64)
    err = ctypes.c_double(0.0)
    rc = lib.pose_graph_optimize(
        len(poses),
        poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        fixed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(edges_ij),
        edges_ij.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        measurements.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        information.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(max_iterations),
        ctypes.byref(err),
    )
    if rc != 0:
        raise RuntimeError(f"native pose_graph_optimize failed with code {rc}")
    return poses, float(err.value)
