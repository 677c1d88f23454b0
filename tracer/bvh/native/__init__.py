"""ctypes bindings for the native C++ BVH builder.

Loads libtracer_bvh.so (built by the Makefile in this directory). The
builder dispatch in tracer.bvh.builder uses this when available and
falls back to NumPy otherwise; both produce valid median-split trees.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libtracer_bvh.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.tracer_build_bvh.restype = ctypes.c_int32
    lib.tracer_build_bvh.argtypes = [
        ctypes.c_int32,
        f32p, f32p, f32p, i32p, i32p,  # in: lo, hi, centroid, kind, index
        f32p, f32p, i32p, i32p, i32p, i32p,  # out
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh(lo, hi, centroid, kind, index):
    """Same contract as builder.build_bvh_numpy."""
    lib = _load()
    assert lib is not None
    num = len(kind)
    if num == 0:
        z3 = np.zeros((0, 3), np.float32)
        zi = np.zeros(0, np.int32)
        return z3, z3, zi, zi, zi, zi
    n_nodes = 2 * num - 1
    box_min = np.empty((n_nodes, 3), np.float32)
    box_max = np.empty((n_nodes, 3), np.float32)
    left = np.empty(n_nodes, np.int32)
    right = np.empty(n_nodes, np.int32)
    nkind = np.empty(n_nodes, np.int32)
    axis = np.empty(n_nodes, np.int32)
    written = lib.tracer_build_bvh(
        num,
        np.ascontiguousarray(lo, np.float32),
        np.ascontiguousarray(hi, np.float32),
        np.ascontiguousarray(centroid, np.float32),
        np.ascontiguousarray(kind, np.int32),
        np.ascontiguousarray(index, np.int32),
        box_min, box_max, left, right, nkind, axis,
    )
    assert written == n_nodes, (written, n_nodes)
    return box_min, box_max, left, right, nkind, axis
