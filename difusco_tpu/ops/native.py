"""ctypes bindings for the native C++ merge library.

The CPU-offload analog of ``merge_heatmap_device`` (capability parity with
the reference's compiled Cython merge + multiprocessing.Pool,
tsp_utils.py:81-130 — here a std::thread pool inside one shared library).
Built from native/merge/merge.cpp via ``make -C native``; auto-builds on
first use if the toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libmerge.so")
_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native"), "build/libmerge.so"],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.merge_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # points
        ctypes.POINTER(ctypes.c_double),  # heats
        ctypes.c_int,  # s
        ctypes.c_int,  # n
        ctypes.POINTER(ctypes.c_int32),  # out_adj
        ctypes.POINTER(ctypes.c_int32),  # out_tours
        ctypes.POINTER(ctypes.c_int32),  # out_iters
        ctypes.c_int,  # n_threads
    ]
    lib.merge_batch.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def merge_heatmap_native(
    points: np.ndarray, heats: np.ndarray, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge a batch of symmetrized heatmaps on the CPU.

    Args:
      points: (V, 2) float64; heats: (S, V, V) float64, already A + A^T.
    Returns:
      (tours (S, V+1) int32, adjacency (S, V, V) int32, iterations (S,) int32)
    """
    lib = _load()
    heats = np.ascontiguousarray(heats, np.float64)
    if heats.ndim == 2:
        heats = heats[None]
    points = np.ascontiguousarray(points, np.float64)
    S, V, _ = heats.shape
    adj = np.zeros((S, V, V), np.int32)
    tours = np.zeros((S, V + 1), np.int32)
    iters = np.zeros((S,), np.int32)
    lib.merge_batch(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        heats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        S,
        V,
        adj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tours.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return tours, adj, iters
