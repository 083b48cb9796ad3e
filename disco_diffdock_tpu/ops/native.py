"""ctypes loader for the native host-side graph ops (csrc/graph_ops.cpp).

Compiles the shared library on first use (g++, cached next to the source) and
falls back to the numpy implementations when no compiler is available.  Used
by the preprocessing pipeline, where C-alpha / all-atom neighbor search over
tens of thousands of atoms is the host bottleneck.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc"
)
_LIB_PATH = os.path.join(_CSRC, "libgraph_ops.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_CSRC, "graph_ops.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", _LIB_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.knn_edges.restype = ctypes.c_int
        lib.knn_edges.argtypes = [f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, i32p, i32p, ctypes.c_int]
        lib.radius_pairs.restype = ctypes.c_int
        lib.radius_pairs.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, i32p, i32p, ctypes.c_int]
        lib.min_cross_distance.restype = ctypes.c_float
        lib.min_cross_distance.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int]
        lib.graph_automorphisms.restype = ctypes.c_int
        lib.graph_automorphisms.argtypes = [i32p, ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"| WARNING: native graph_ops unavailable ({e}); using numpy fallback")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def knn_edges(pos: np.ndarray, cutoff: float, max_neighbors: int | None):
    """Native cell-list kNN with reference semantics; numpy fallback."""
    lib = _load()
    pos = np.ascontiguousarray(pos, np.float32)
    n = len(pos)
    if lib is None:
        from ..graphs.radius import knn_edges_host

        return knn_edges_host(pos, cutoff, max_neighbors)
    if n == 0:  # cap would start at 0 and the grow loop could never terminate
        return np.empty(0, np.int32), np.empty(0, np.int32)
    cap = n * (max_neighbors or 64) + n
    while True:
        src = np.empty(cap, np.int32)
        dst = np.empty(cap, np.int32)
        m = lib.knn_edges(pos, n, float(cutoff), int(max_neighbors or 0), src, dst, cap)
        if m < cap:  # the C side truncates at capacity; m == cap means retry
            return src[:m].copy(), dst[:m].copy()
        cap *= 2


def radius_pairs(pos_a: np.ndarray, pos_b: np.ndarray, cutoff: float, capacity: int | None = None):
    lib = _load()
    pos_a = np.ascontiguousarray(pos_a, np.float32)
    pos_b = np.ascontiguousarray(pos_b, np.float32)
    if lib is None:
        d = np.linalg.norm(pos_a[:, None] - pos_b[None], axis=-1)
        a, b = np.nonzero(d < cutoff)
        return a.astype(np.int32), b.astype(np.int32)
    if len(pos_a) == 0 or len(pos_b) == 0:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    cap = capacity or (len(pos_a) * 256)
    while True:
        a = np.empty(cap, np.int32)
        b = np.empty(cap, np.int32)
        m = lib.radius_pairs(pos_a, len(pos_a), pos_b, len(pos_b), float(cutoff), a, b, cap)
        if m < cap or capacity is not None:
            return a[:m].copy(), b[:m].copy()
        cap *= 2


def graph_automorphisms(elements: np.ndarray, bonds: np.ndarray, max_count: int = 1000):
    """Element-labelled bond-graph automorphisms (native backtracking search;
    the symmetry-RMSD hot path).  Returns a list of permutation arrays, or
    None when the native library is unavailable (caller falls back to
    networkx VF2)."""
    lib = _load()
    if lib is None:
        return None
    elements = np.ascontiguousarray(elements, np.int32)
    bonds = np.ascontiguousarray(np.asarray(bonds).reshape(-1, 2), np.int32)
    n = len(elements)
    out = np.empty((max_count, max(n, 1)), np.int32)
    m = lib.graph_automorphisms(elements, n, bonds, len(bonds), out, max_count)
    return [out[i, :n].copy() for i in range(m)]


def min_cross_distance(a: np.ndarray, b: np.ndarray) -> float:
    lib = _load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None:
        return float(np.linalg.norm(a[:, None] - b[None], axis=-1).min())
    return float(lib.min_cross_distance(a, len(a), b, len(b)))
