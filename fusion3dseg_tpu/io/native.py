"""ctypes bindings to the native C++ grid neighbor library.

Host-side counterpart of ops/neighbors.py (device path): builds fixed-degree
or CSR radius adjacencies and connected components for clouds that exceed
device memory, replacing the reference's external `ConnectedGraph` binary
(planeUtils.py:37-49) and sklearn KDTree adjacency (fusion.py:374-375).
The library uses a counting-sorted DENSE cell grid (queries stream
contiguous z-runs; see native/neighbor_graph.cpp) with a spatial-hash
fallback for degenerate extents.

The library auto-builds on first use via `make -C native` (g++ is in the
image); set FUSION3DSEG_NO_NATIVE=1 to force the pure-NumPy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libneighbor_graph.so"
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    if os.environ.get("FUSION3DSEG_NO_NATIVE"):
        return None
    if not _LIB_PATH.is_file():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "libneighbor_graph.so"],
                check=True, capture_output=True,
            )
        except Exception:
            # cache the failure: without this, every native.* call on a
            # host missing g++/make re-spawns a failing subprocess
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib = False
        return None
    lib.radius_graph.restype = ctypes.c_int
    lib.radius_graph.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.radius_graph_csr.restype = ctypes.c_int
    lib.radius_graph_csr.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.connected_components.restype = ctypes.c_int
    lib.connected_components.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    try:
        lib.components_from_adjacency.restype = ctypes.c_int
        lib.components_from_adjacency.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
    except AttributeError:  # stale .so from before the symbol existed
        pass
    try:
        lib.components_from_csr.restype = ctypes.c_int
        lib.components_from_csr.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
    except AttributeError:
        pass
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_f32c(points) -> np.ndarray:
    pts = np.ascontiguousarray(np.asarray(points, np.float32))
    assert pts.ndim == 2 and pts.shape[1] == 3
    return pts


def radius_graph(points, radius: float, k: int = 16) -> np.ndarray:
    """[N, k] int32 fixed-degree adjacency (-1 padded, nearest-first)."""
    lib = _load()
    pts = _as_f32c(points)
    n = len(pts)
    adj = np.empty((n, k), np.int32)
    if n == 0:  # the native call returns rc=1 for n <= 0
        return adj
    if lib is None:
        from scipy.spatial import cKDTree

        tree = cKDTree(pts)
        adj.fill(-1)
        for i, (dists, idx) in enumerate(
            zip(*tree.query(pts, k=k, distance_upper_bound=radius * (1 + 1e-6)))
        ):
            sel = np.isfinite(dists)
            adj[i, : sel.sum()] = idx[sel]
        return adj
    rc = lib.radius_graph(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(radius), k,
        adj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"radius_graph failed rc={rc}")
    return adj


def radius_graph_lists(points, radius: float):
    """Object-array adjacency lists (the reference adj.pkl format,
    fusion.py:374-377) via the CSR two-pass API."""
    lib = _load()
    pts = _as_f32c(points)
    n = len(pts)
    if n == 0:  # the native call returns rc=1 for n <= 0
        return np.empty(0, object)
    if lib is None:
        from scipy.spatial import cKDTree

        lists = cKDTree(pts).query_ball_point(pts, radius)
        out = np.empty(n, object)
        for i, l in enumerate(lists):
            out[i] = np.asarray(l, np.int64)
        return out
    offsets = np.empty(n + 1, np.int64)
    rc = lib.radius_graph_csr(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(radius),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), None,
    )
    if rc != 0:
        raise RuntimeError(f"radius_graph_csr count failed rc={rc}")
    indices = np.empty(int(offsets[n]), np.int32)
    rc = lib.radius_graph_csr(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(radius),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"radius_graph_csr fill failed rc={rc}")
    out = np.empty(n, object)
    for i in range(n):
        out[i] = indices[offsets[i] : offsets[i + 1]].astype(np.int64)
    return out


def connected_components(points, radius: float, labels=None) -> np.ndarray:
    """[N] int32 component roots (min point index); optional same-label
    restriction — the ConnectedGraph capability as a library call."""
    lib = _load()
    pts = _as_f32c(points)
    n = len(pts)
    if n == 0:
        return np.empty(0, np.int32)
    if lib is None:
        # pure-NumPy fallback INSIDE the package (an installed copy has no
        # tests/ tree): the same two-cloud grid query builds the edge CSR,
        # then the union-find mirrors the native semantics
        from fusion3dseg_tpu.pipeline.correspondence import (
            _two_cloud_radius_pairs,
        )

        src, dst = _two_cloud_radius_pairs(pts, pts, radius)
        lab = None if labels is None else np.asarray(labels)
        root = np.arange(n, dtype=np.int64)

        def find(a):
            while root[a] != a:
                root[a] = root[root[a]]
                a = root[a]
            return a

        for i, j in zip(src.tolist(), dst.tolist()):
            if i == j or (lab is not None and lab[i] != lab[j]):
                continue
            ra, rb = find(i), find(j)
            if ra != rb:
                root[max(ra, rb)] = min(ra, rb)
        return np.asarray([find(i) for i in range(n)], np.int32)
    out = np.empty(n, np.int32)
    lab_ptr = None
    if labels is not None:
        lab = np.ascontiguousarray(np.asarray(labels, np.int32))
        lab_ptr = lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.connected_components(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(radius), lab_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"connected_components failed rc={rc}")
    return out


def components_from_adjacency(adj, labels=None):
    """[N] int32 component roots (min point index) over an existing [N, K]
    fixed-degree adjacency (-1 padded), optionally restricted to equal
    `labels` — union-find; the host fast path behind
    ops/components.split_into_instances. Returns None when the native
    library (or the symbol, for a stale build) is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "components_from_adjacency"):
        return None
    a = np.ascontiguousarray(np.asarray(adj, np.int32))
    assert a.ndim == 2
    n, k = a.shape
    if n == 0:
        return np.empty(0, np.int32)
    out = np.empty(n, np.int32)
    lab_ptr = None
    if labels is not None:
        lab = np.ascontiguousarray(np.asarray(labels, np.int32))
        lab_ptr = lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.components_from_adjacency(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, k, lab_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"components_from_adjacency failed rc={rc}")
    return out


def components_from_csr(offsets, flat, labels=None):
    """[N] int32 component roots over a ragged CSR adjacency (neighbors of
    i = flat[offsets[i]:offsets[i+1]]) — same weakly-connected min-root
    semantics as components_from_adjacency without densifying to
    [N, max_degree]. Returns None when the library/symbol is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "components_from_csr"):
        return None
    offsets = np.asarray(offsets)
    assert int(offsets[-1]) < np.iinfo(np.int32).max, (
        "edge count exceeds int32 CSR offsets; split the graph"
    )
    off = np.ascontiguousarray(offsets.astype(np.int32))
    fl = np.ascontiguousarray(np.asarray(flat, np.int32))
    n = len(off) - 1
    if n <= 0:
        return np.empty(0, np.int32)
    out = np.empty(n, np.int32)
    lab_ptr = None
    if labels is not None:
        lab = np.ascontiguousarray(np.asarray(labels, np.int32))
        lab_ptr = lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.components_from_csr(
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, lab_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"components_from_csr failed rc={rc}")
    return out
