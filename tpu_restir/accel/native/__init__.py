"""ctypes bindings for the native (C++) acceleration-structure builders.

Compiles accel.cpp to libaccel.so on first use (g++ -O3 -fopenmp) and
exposes build_clusters_native / build_bvh2_native. All callers go through
tpu_restir.accel.bvh, which falls back to the numpy builders when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "accel.cpp")
_SO = os.path.join(_DIR, "libaccel.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                 "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.accel_build_clusters.restype = ctypes.c_int
        lib.accel_build_clusters.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, f32p, f32p]
        lib.accel_build_bvh2.restype = ctypes.c_int
        lib.accel_build_bvh2.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_clusters_native(tri_v: np.ndarray, cluster_size: int):
    """Returns (order, cmin, cmax) or None when the library is missing."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(tri_v, np.float32)
    n = v.shape[0]
    n_clusters = -(-n // cluster_size)
    order = np.empty(n, np.int32)
    cmin = np.empty((n_clusters, 3), np.float32)
    cmax = np.empty((n_clusters, 3), np.float32)
    got = lib.accel_build_clusters(v, n, cluster_size, order, cmin, cmax)
    assert got == n_clusters
    return order, cmin, cmax


def build_bvh2_native(tri_v: np.ndarray, leaf_size: int = 4,
                      n_bins: int = 16):
    """Returns dict of flat BVH2 arrays or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(tri_v, np.float32)
    n = v.shape[0]
    cap = max(2 * n, 2)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    start = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)
    depth = ctypes.c_int(0)
    m = lib.accel_build_bvh2(v, n, leaf_size, n_bins, node_min, node_max,
                             left, right, start, count, order,
                             ctypes.byref(depth))
    return dict(node_min=node_min[:m], node_max=node_max[:m], left=left[:m],
                right=right[:m], start=start[:m], count=count[:m],
                order=order, max_depth=int(depth.value))
