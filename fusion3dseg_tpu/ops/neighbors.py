"""Fixed-radius neighbor graph on TPU (grid-hash, sort + binary search).

Replaces two reference components at once (SURVEY.md §2.20):
  * the sklearn KDTree radius adjacency built at fusion dump time
    (reference fusion.py:374-375: tree.query_radius(points, r=2*ds_radius)),
  * the external C++ `Executables/ConnectedGraph` binary
    (reference segUtils/planeUtils.py:37-49).

Design: quantize points to grid cells of side `radius`, sort once by linear
cell key, then every point binary-searches its 27 neighboring cells and
gathers up to `cap_per_cell` candidates from each — all static shapes, all
vectorized, chunked over the point axis with lax.map to bound memory. The
k nearest in-radius candidates per point become a fixed-degree [N, K]
adjacency (-1 padded), the graph format consumed by
ops/components.propagate_labels.

A C++ host-side builder with identical output lives in native/ for
out-of-device-memory scenes; this is the device-resident fast path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = jnp.iinfo(jnp.int32).max

# 27-cell neighborhood offsets, [27, 3]. Kept as a HOST array: a
# module-level jnp.asarray would contact the backend at import time (the
# whole package must import without touching devices — an unreachable
# TPU tunnel otherwise hangs every importer before main() can guard it).
_OFFSETS = np.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    np.int32,
)


def radius_graph(
    points,
    radius,
    valid=None,
    k: int = 16,
    cap_per_cell: int = 8,
    chunk: int = 4096,
):
    """Host-checked wrapper: the linear cell key must fit int32 (scene
    extent / radius bounded at ~1290 cells per axis in the worst case);
    beyond that, use the native C++ builder (io/native.py) whose keys are
    hashed 64-bit."""
    import numpy as np

    # the extent guard needs only per-axis min/max: for a device-resident
    # cloud compute those ON device and pull 6 floats, not the whole [N,3]
    # array through the ~20-40 MB/s tunnel (CLAUDE.md transfer rule)
    if isinstance(points, jax.Array):
        npts_in = points.shape[0]
        fin_d = jnp.isfinite(points).all(axis=-1)
        if valid is not None:
            fin_d = fin_d & jnp.asarray(valid)
        big = jnp.float32(3.0e38)
        pmin_d = jnp.min(jnp.where(fin_d[:, None], points, big), axis=0)
        pmax_d = jnp.max(jnp.where(fin_d[:, None], points, -big), axis=0)
        any_fin = bool(np.asarray(jnp.any(fin_d)))
        pts_minmax = (np.asarray(pmin_d), np.asarray(pmax_d))
    else:
        pts_host = np.asarray(points)
        npts_in = len(pts_host)
        fin = np.isfinite(pts_host).all(axis=-1)
        if valid is not None:
            fin &= np.asarray(valid)
        any_fin = bool(fin.any())
        pts_minmax = (
            (pts_host[fin].min(0), pts_host[fin].max(0)) if any_fin
            else (np.zeros(3), np.zeros(3))
        )
    if npts_in >= (1 << 24):
        # candidate ids ride the fused stab table as float32 (exact only
        # below 2^24); beyond that adjacency indices would silently corrupt
        # (review finding r2) — the native C++ builder has no such bound
        raise ValueError(
            f"radius_graph supports < 2^24 points (got {npts_in}); "
            "use fusion3dseg_tpu.io.native.radius_graph for larger clouds"
        )
    ncells = 1.0
    if any_fin:
        ext = pts_minmax[1] - pts_minmax[0]
        cells = np.maximum(ext / float(radius) + 2, 1.0)
        ncells = float(np.prod(np.ceil(cells)))
        if ncells >= 2**31:
            raise ValueError(
                f"scene extent {ext} at radius {radius} needs {cells} grid "
                "cells — linear int32 keys would overflow; use "
                "fusion3dseg_tpu.io.native.radius_graph instead"
            )
    if ncells < 2**24:
        # bounded scene: dense CSR start/count tables, direct cell
        # addressing (no binary search — searchsorted's log-N scan of
        # single-int gathers dominates the sparse path, measured
        # docs/DESIGN.md). Table capacity rounds up to a power of two so
        # scenes of similar size share one compilation.
        ncap = 1 << max(int(np.ceil(np.log2(max(ncells, 2.0)))), 10)
        return _radius_graph_dense(
            points, radius, valid, k=k, cap_per_cell=cap_per_cell,
            chunk=chunk, ncap=ncap,
        )
    return _radius_graph_jit(points, radius, valid, k=k, cap_per_cell=cap_per_cell, chunk=chunk)


@partial(jax.jit, static_argnames=("k", "cap_per_cell", "chunk", "ncap"))
def _radius_graph_impl(
    points: jax.Array,
    radius: float | jax.Array,
    valid: Optional[jax.Array] = None,
    k: int = 16,
    cap_per_cell: int = 8,
    chunk: int = 4096,
    ncap: Optional[int] = None,
) -> jax.Array:
    """Build a fixed-degree radius-neighbor adjacency.

    One implementation, two cell-lookup strategies selected by `ncap`:

      * ncap=None — sparse: every point binary-searches its 27 neighboring
        cells in the sorted key array (works for any scene extent);
      * ncap=<power of two> — dense CSR: [ncap] start/count tables indexed
        directly by the linear cell key (one scatter-add + one cumsum to
        build, one fused row gather to query). ~3x faster — searchsorted's
        log-N scan of serialized single-int gathers dominates the sparse
        path — but requires every linear key < ncap (the host wrapper
        guarantees it for bounded scenes).

    Args:
      points: [N, 3] float32. N is padded to a multiple of `chunk` internally.
      radius: neighbor radius (inclusive, like KDTree.query_radius).
      valid: [N] bool; invalid points get no neighbors and are never returned
        as neighbors.
      k: max neighbors kept per point (nearest-first). The point itself is
        included (distance 0), matching the reference adjacency.
      cap_per_cell: max candidates considered per neighboring cell.
      chunk: point-axis tile size for the candidate-gather stage.

    Returns:
      adj: [N, k] int32 neighbor indices sorted by distance, -1 padded.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    points = points.astype(jnp.float32)

    big = jnp.float32(3.0e38)
    pmin = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    cells = jnp.floor((points - pmin) / radius).astype(jnp.int32)
    cells = jnp.maximum(cells, 0)
    cmax = jnp.max(jnp.where(valid[:, None], cells, -1), axis=0)
    # +2 headroom so a +1 cell offset can never alias the next row
    ny, nz = cmax[1] + 2, cmax[2] + 2

    def key_of(c):
        return (c[..., 0] * ny + c[..., 1]) * nz + c[..., 2]

    invalid_key = INT32_MAX if ncap is None else ncap
    keys = jnp.where(valid, key_of(cells), invalid_key)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    skeys, sidx = jax.lax.sort((keys, ids), num_keys=1)
    spts = points[sidx]
    svalid = valid[sidx]
    # fused candidate table: [id-or--1, x, y, z] so the per-candidate read
    # is ONE row gather instead of three (sidx/spts/svalid) — gathers
    # serialize per row (docs/DESIGN.md). ids ride as f32: exact < 2^24,
    # far above the 2^20 packed-id shard bound that caps n anyway.
    stab = jnp.concatenate(
        [jnp.where(svalid, sidx, -1).astype(jnp.float32)[:, None], spts],
        axis=1,
    )
    if ncap is not None:
        counts_tab = jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32), keys, num_segments=ncap + 1
        )
        starts_tab = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_tab[:ncap])]
        )  # exclusive prefix: starts_tab[key] = first sorted row of the cell
        sc_tab = jnp.stack([starts_tab[: ncap + 1], counts_tab], axis=1)

    cap = cap_per_cell
    r2 = jnp.float32(radius) * jnp.float32(radius)

    pad = (-n) % chunk
    q_pts = jnp.pad(points, ((0, pad), (0, 0)))
    q_cells = jnp.pad(cells, ((0, pad), (0, 0)))
    q_valid = jnp.pad(valid, (0, pad))
    nchunks = (n + pad) // chunk

    def one_chunk(args):
        qp, qc, qv = args  # [B,3], [B,3], [B]
        ncell = qc[:, None, :] + _OFFSETS[None]  # [B, 27, 3]
        ncell_ok = jnp.all(ncell >= 0, axis=-1)
        arange_cap = jnp.arange(cap, dtype=jnp.int32)
        if ncap is None:
            nkey = key_of(ncell)  # [B, 27]
            starts = jnp.searchsorted(skeys, nkey, side="left").astype(jnp.int32)
            ends = jnp.searchsorted(skeys, nkey, side="right").astype(jnp.int32)
            pos = starts[..., None] + arange_cap  # [B,27,cap]
            in_range = (pos < ends[..., None]) & ncell_ok[..., None]
        else:
            nkey = jnp.where(ncell_ok, key_of(ncell), ncap)
            nkey = jnp.clip(nkey, 0, ncap)
            # fused [starts, counts] row gather per neighbor cell
            sc = sc_tab[nkey]
            starts, cnts = sc[..., 0], sc[..., 1]
            pos = starts[..., None] + arange_cap
            in_range = (arange_cap < cnts[..., None]) & ncell_ok[..., None]
        pos = jnp.clip(pos, 0, n - 1)
        crow = stab[pos]  # [B,27,cap,4] — one fused row gather
        cand_idx = crow[..., 0].astype(jnp.int32)
        cand_pts = crow[..., 1:]
        d2 = jnp.sum((cand_pts - qp[:, None, None, :]) ** 2, axis=-1)
        ok = in_range & (cand_idx >= 0) & (d2 <= r2) & qv[:, None, None]
        d2 = jnp.where(ok, d2, big).reshape(qp.shape[0], 27 * cap)
        flat_idx = cand_idx.reshape(qp.shape[0], 27 * cap)
        neg, top = jax.lax.top_k(-d2, k)
        rows = jax.lax.broadcasted_iota(jnp.int32, (qp.shape[0], k), 0)
        out = jnp.where(neg > -big, flat_idx[rows, top], -1)
        return out.astype(jnp.int32)

    adj = jax.lax.map(
        one_chunk,
        (
            q_pts.reshape(nchunks, chunk, 3),
            q_cells.reshape(nchunks, chunk, 3),
            q_valid.reshape(nchunks, chunk),
        ),
    ).reshape(n + pad, k)
    return adj[:n]


def _radius_graph_jit(points, radius, valid=None, k=16, cap_per_cell=8,
                      chunk=4096):
    """Sparse-lookup variant (any extent)."""
    return _radius_graph_impl(points, radius, valid, k=k,
                              cap_per_cell=cap_per_cell, chunk=chunk,
                              ncap=None)


def _radius_graph_dense(points, radius, valid=None, k=16, cap_per_cell=8,
                        chunk=4096, ncap=1 << 20):
    """Dense-table variant (bounded scenes; every linear key < ncap)."""
    return _radius_graph_impl(points, radius, valid, k=k,
                              cap_per_cell=cap_per_cell, chunk=chunk,
                              ncap=ncap)


def adjacency_to_lists(adj) -> "object":
    """[N, K] padded adjacency -> numpy object array of index arrays.

    Mirrors the reference artifact format of adj.pkl (fusion.py:374-377):
    an object ndarray of per-point neighbor-index arrays.
    """
    import numpy as np

    adj = np.asarray(adj)
    out = np.empty(len(adj), dtype=object)
    for i, row in enumerate(adj):
        out[i] = row[row >= 0].astype(np.int64)
    return out


def lists_to_adjacency(lists, k: int) -> "object":
    """Reference-format object-array adjacency -> fixed-degree [N, k] int32."""
    import numpy as np

    n = len(lists)
    adj = np.full((n, k), -1, np.int32)
    for i, row in enumerate(lists):
        row = np.asarray(list(row), np.int32)[:k]
        adj[i, : len(row)] = row
    return adj


def lists_to_csr(lists):
    """Ragged adjacency lists -> CSR (offsets [N+1] int32, flat int32).

    One C-level concatenate instead of a per-row Python densify; pairs with
    io/native.components_from_csr so the instance split never materializes
    an [N, max_degree] table sized by the single densest point."""
    import numpy as np

    lengths = np.fromiter((len(r) for r in lists), np.int64, count=len(lists))
    offsets = np.zeros(len(lists) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = (np.concatenate([np.asarray(r, np.int32) for r in lists])
            if len(lists) else np.empty(0, np.int32))
    assert offsets[-1] < np.iinfo(np.int32).max
    return offsets.astype(np.int32), flat.astype(np.int32)


def csr_to_adjacency(offsets, flat):
    """CSR -> fixed-degree [N, max_degree] int32 (-1 padded), vectorized."""
    import numpy as np

    offsets = np.asarray(offsets, np.int64)
    flat = np.asarray(flat, np.int32)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    k = int(lengths.max()) if n else 0
    adj = np.full((n, max(k, 1)), -1, np.int32)
    # row-major positions of every edge in the padded table
    rows = np.repeat(np.arange(n), lengths)
    cols = (np.arange(len(flat)) - np.repeat(offsets[:-1], lengths))
    adj[rows, cols] = flat
    return adj
