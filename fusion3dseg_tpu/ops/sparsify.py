"""Deterministic patch sparsification (frame point-cloud downsampling).

Capability parity with reference Fusion.patch_downsample
(fusion.py:134-210): sparsify one frame's dense depth point cloud by merging
points that fall in the same image patch, are within `radius` of each other,
and have consistent surface normals (cos > min_cosine); merged clusters
become their mean position/color/normal, with nmerges counters and a
pixel->sparse-point `uv2pt` lookup.

The reference visits points in np.random.shuffle order and greedily grows
patches (fusion.py:172-208) — sequential and nondeterministic. TPU re-design
(SURVEY.md §7.1): group pixels by (image patch, depth bin, normal pass) cell
and take segment means per cell:

  * patch cell (stride x stride pixels) bounds the in-image extent; at
    typical indoor depth/intrinsics the patch's world xy-extent is below the
    merge radius, so binning depth in `radius`-sized bins bounds the full
    Euclidean criterion;
  * a two-pass normal split assigns points whose normal disagrees with the
    cell mean (cos <= min_cosine) to a secondary cell, preserving the
    normal-cone criterion across creases.

Deterministic, O(N), one XLA program of segment reductions — same
sparsification density and criterion semantics, without the visit-order
dependence (parity with the reference is statistical by design, SURVEY.md §7
"hard parts" (a)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparsifyResult(NamedTuple):
    """Padded per-cell sparsified frame. Slots with count == 0 are empty."""

    points: jax.Array  # [C, 3] cell mean positions
    normals: jax.Array  # [C, 3] cell mean unit normals
    colors: jax.Array  # [C, 3] cell mean colors
    counts: jax.Array  # [C] int32 points merged per cell (= nmerges)
    cell_of_pixel: jax.Array  # [H*W] int32 cell slot per pixel, -1 invalid
    num_cells: int  # static C


def num_cells(height: int, width: int, stride: int, zbins: int) -> int:
    hp = -(-height // stride)
    wp = -(-width // stride)
    return hp * wp * zbins * 2


def patch_sparsify(
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    depth: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    stride: int,
    radius: float,
    min_cosine: float,
    max_depth: float,
) -> SparsifyResult:
    """Sparsify one frame (dense pixel cloud -> per-cell means).

    Args:
      points, normals, colors: [H*W, 3] row-major per-pixel data.
      depth: [H*W] camera-frame depth (meters) used for radius binning.
      valid: [H*W] bool; invalid pixels don't contribute and map to cell -1.
      height, width, stride: image geometry (static).
      radius: merge distance threshold (= depth bin size).
      min_cosine: normal-agreement threshold.
      max_depth: static depth cap defining the number of depth bins.

    Returns:
      SparsifyResult with C = ceil(H/s)*ceil(W/s)*ceil(max_depth/radius)*2
      padded cell slots.
    """
    hp = -(-height // stride)
    wp = -(-width // stride)
    zb = max(1, int(-(-max_depth // radius)))
    c_base = hp * wp * zb
    C = c_base * 2

    u = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).reshape(-1)
    v = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).reshape(-1)
    patch = (v // stride) * wp + (u // stride)
    zbin = jnp.clip((depth / radius).astype(jnp.int32), 0, zb - 1)
    cell = patch * zb + zbin  # [H*W] in [0, c_base)

    seg0 = jnp.where(valid, cell, c_base)  # trash segment c_base

    # pass 1: cell mean normal
    nsum = jax.ops.segment_sum(
        jnp.where(valid[:, None], normals, 0.0), seg0, num_segments=c_base + 1
    )
    nmean = nsum / jnp.maximum(jnp.linalg.norm(nsum, axis=-1, keepdims=True), 1e-12)
    agree = jnp.einsum(
        "nc,nc->n", normals, nmean[jnp.clip(seg0, 0, c_base - 1)], precision="highest"
    )
    secondary = (agree <= min_cosine) & valid

    # pass 2: split disagreeing points into the secondary subcell
    cell2 = cell * 2 + secondary.astype(jnp.int32)
    seg = jnp.where(valid, cell2, C)

    ones = valid.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=C + 1)
    psum = jax.ops.segment_sum(points * ones[:, None], seg, num_segments=C + 1)
    csum = jax.ops.segment_sum(colors * ones[:, None], seg, num_segments=C + 1)
    n2sum = jax.ops.segment_sum(normals * ones[:, None], seg, num_segments=C + 1)

    denom = jnp.maximum(cnt[:, None], 1.0)
    mean_pts = (psum / denom)[:C]
    mean_clr = (csum / denom)[:C]
    mean_nrm = n2sum[:C]
    mean_nrm = mean_nrm / jnp.maximum(
        jnp.linalg.norm(mean_nrm, axis=-1, keepdims=True), 1e-12
    )
    counts = cnt[:C].astype(jnp.int32)
    cell_of_pixel = jnp.where(valid, cell2, -1).astype(jnp.int32)

    return SparsifyResult(mean_pts, mean_nrm, mean_clr, counts, cell_of_pixel, C)


def compact_slots(counts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Compaction map for occupied cell slots.

    Returns:
      dest: [C] int32 — rank of each occupied slot among occupied slots
        (garbage where count == 0, mask with `occupied`).
      total: scalar int32 number of occupied slots.
    """
    occupied = counts > 0
    dest = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    return jnp.where(occupied, dest, -1), jnp.sum(occupied.astype(jnp.int32))
