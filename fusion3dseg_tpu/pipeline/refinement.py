"""Segmentation refinement: gated flood-fill growth + door/wall alignment.

Capability parity with reference segUtils/refinement.py: grow an instance
(e.g. a door) over the neighbor graph gated by either perpendicular
distance to its wall plane (depth_floodfill_dl/_point, reference :83-269) or
RGB similarity (color_floodfill_dl/_point, :272-432); snap door polygons
onto wall boundaries (door_updation, :40-80); rotate a door bbox onto the
wall bottom edge (door_floor_align, :443-513); persist results to
cv_segmentation/{pcd.ply, ids.npy} with resume-if-exists (:134-141,223-230).

Re-design:
  * The reference's flood fills are sequential queue BFS with a running mean
    updated in visit order (:113-129). Here growth is an iterative batch
    frontier expansion under jit (lax.while_loop): each round admits every
    neighbor within `threshold` of the cluster mean, then recomputes the
    mean over the whole cluster. Each round corresponds to one BFS level
    (the reference's max_level cap maps to the iteration cap); the mean is
    the exact cluster mean rather than a visit-order-dependent running mean
    — deterministic, vectorized, and order-independent.
  * Interactive open3d picking (meshUtils.pick_points) is replaced by a
    batch API: callers pass explicit seed point indices or instance ids
    (SURVEY.md §7.7).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.geometry import quaternion as quat
from fusion3dseg_tpu.io import ply


@partial(jax.jit, static_argnames=("max_level",))
def gated_floodfill(
    adj: jax.Array,  # [N, K] int32, -1 padded
    seeds: jax.Array,  # [N] bool — initial cluster
    values: jax.Array,  # [N] or [N, C] gate values (distance or color)
    threshold: jax.Array,  # scalar or [C]
    max_level: int = 50,
) -> jax.Array:
    """Grow `seeds` over the graph admitting neighbors whose value lies
    within `threshold` of the cluster mean. Returns [N] bool membership.

    Gate: |value - mean(cluster values)| <= threshold on every channel
    (reference criterion :118 / :305).
    """
    if values.ndim == 1:
        values = values[:, None]
    threshold = jnp.broadcast_to(jnp.asarray(threshold, values.dtype), (values.shape[1],))
    adj_ok = adj >= 0
    adj_safe = jnp.where(adj_ok, adj, 0)

    def mean_of(member):
        w = member.astype(values.dtype)[:, None]
        return jnp.sum(values * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)

    def cond(state):
        member, grew, it = state
        return grew & (it < max_level)

    def body(state):
        member, _, it = state
        frontier = jnp.any(member[adj_safe] & adj_ok, axis=-1) & ~member
        mean = mean_of(member)
        admit = frontier & jnp.all(jnp.abs(values - mean) <= threshold, axis=-1)
        new_member = member | admit
        return new_member, jnp.any(admit), it + 1

    member, _, _ = jax.lax.while_loop(cond, body, (seeds, jnp.bool_(True), 0))
    return member


def perpendicular_distance(points, plane_point, plane_normal) -> np.ndarray:
    """|dot(p - p0, n)| per point (reference :152-154, :245-247)."""
    n = np.asarray(plane_normal, np.float64)
    n = n / np.linalg.norm(n)
    return np.abs((np.asarray(points) - np.asarray(plane_point)) @ n)


def _load_refinement_state(outputpath) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cv_segmentation resume-if-exists (reference :134-141), else fall back
    to panoptic_segmentation. Returns (instance_id, points, colors)."""
    outputpath = Path(outputpath)
    cv = outputpath / "cv_segmentation"
    cv.mkdir(parents=True, exist_ok=True)
    if (cv / "ids.npy").is_file() and (cv / "pcd.ply").is_file():
        ids = np.load(cv / "ids.npy")
        pts, colors, _ = ply.read_point_cloud(cv / "pcd.ply")
    else:
        pan = outputpath / "panoptic_segmentation"
        ids = np.load(pan / "ids.npy")
        pts, colors, _ = ply.read_point_cloud(pan / "pcd.ply")
    if colors is None:
        colors = np.zeros_like(pts)
    return ids, pts, colors


def depth_floodfill(
    outputpath,
    adj,
    seed_point: int,
    wall_point,
    wall_normal,
    depth_threshold: float = 0.03,
    max_level: int = 50,
    grow_from_instance: bool = True,
    save: bool = True,
):
    """Grow the instance at `seed_point` by wall-perpendicular-distance
    similarity (reference depth_floodfill_dl :83-174 when
    grow_from_instance=True; depth_floodfill_point :177-269 when False —
    there the single seed grows directly).

    Args:
      outputpath: session directory (reads panoptic/cv segmentation state).
      adj: [N, K] int32 fixed-degree adjacency.
      seed_point: picked point index (replaces the interactive picker).
      wall_point, wall_normal: the wall plane.

    Returns (instance_id [N], grown_mask [N]).
    """
    ids, points, colors = _load_refinement_state(outputpath)
    dist = perpendicular_distance(points, wall_point, wall_normal)

    inst = ids[seed_point]
    if grow_from_instance:
        seeds = ids == inst
    else:
        seeds = np.zeros(len(points), bool)
        seeds[seed_point] = True

    member = np.asarray(
        gated_floodfill(
            jnp.asarray(adj, jnp.int32),
            jnp.asarray(seeds),
            jnp.asarray(dist, jnp.float32),
            jnp.float32(depth_threshold),
            max_level=max_level,
        )
    )
    grown = member & ~seeds
    ids = ids.copy()
    ids[member] = inst
    palette = colors[seed_point]
    colors = colors.copy()
    colors[member] = palette
    if save:
        save_ids_ply(points, colors, ids, outputpath)
    return ids, grown


def color_floodfill(
    outputpath,
    adj,
    seed_point: int,
    point_colors,
    color_threshold: float = 0.1,
    max_level: int = 50,
    grow_from_instance: bool = True,
    save: bool = True,
):
    """Grow by RGB similarity (reference color_floodfill_dl :272-351 /
    color_floodfill_point :354-432). `point_colors` are the photometric
    colors (the fused cloud's colors), not the segmentation palette."""
    ids, points, seg_colors = _load_refinement_state(outputpath)
    inst = ids[seed_point]
    if grow_from_instance:
        seeds = ids == inst
    else:
        seeds = np.zeros(len(points), bool)
        seeds[seed_point] = True

    member = np.asarray(
        gated_floodfill(
            jnp.asarray(adj, jnp.int32),
            jnp.asarray(seeds),
            jnp.asarray(point_colors, jnp.float32),
            jnp.float32(color_threshold),
            max_level=max_level,
        )
    )
    grown = member & ~seeds
    ids = ids.copy()
    ids[member] = inst
    seg_colors = seg_colors.copy()
    seg_colors[member] = seg_colors[seed_point]
    if save:
        save_ids_ply(points, seg_colors, ids, outputpath)
    return ids, grown


def save_ids_ply(points, colors, instance_ids, outputpath) -> None:
    """Persist refinement state (reference save_ids_ply :435-440)."""
    cv = Path(outputpath) / "cv_segmentation"
    cv.mkdir(parents=True, exist_ok=True)
    ply.write_point_cloud(cv / "pcd.ply", points, colors=colors)
    np.save(cv / "ids.npy", instance_ids)


# ----------------------- door / wall geometry ------------------------------


def closest_point_on_segment(a, b, p):
    """Closest point on segment ab to p (reference ClosestPointOnLine :51-66,
    which actually projects onto the infinite line; we keep line semantics)."""
    a, b, p = map(np.asarray, (a, b, p))
    ab = b - a
    t = np.dot(p - a, ab) / np.dot(ab, ab)
    q = a + t * ab
    return np.linalg.norm(q - p), q


def door_updation(outer_poly, inner_poly, normal_wall, max_distance: float = 0.2):
    """Snap door polygon onto the wall plane and its nearby edges
    (reference :40-80): project door corners onto the wall plane, then pull
    each corner to wall-polygon edges within max_distance. Edge snaps
    COMPOUND in edge order (each test measures from the already-moved
    corner, and a later qualifying edge overwrites an earlier one) — this
    is deliberate bug-for-bug parity with the reference's numpy-view
    mutation, not a closest-edge selection."""
    outer_poly = np.asarray(outer_poly, np.float64)
    inner = np.asarray(inner_poly, np.float64).copy()
    n = np.asarray(normal_wall, np.float64)
    n = n / np.linalg.norm(n)

    t = outer_poly[0].dot(n) - inner @ n
    inner = inner + t[:, None] * n

    edges = [(outer_poly[i], outer_poly[i + 1]) for i in range(len(outer_poly) - 1)]
    edges.append((outer_poly[0], outer_poly[-1]))
    for z, p in enumerate(inner):
        for a, b in edges:
            dist, q = closest_point_on_segment(a, b, inner[z])
            if dist < max_distance:
                inner[z] = q
    return inner


def door_floor_align(door_bb, wall_bb, flip: bool = True):
    """Rotate the door bbox so its bottom edge parallels the wall's bottom
    edge (reference door_wall_bottom_align :460-484): sort corners by z,
    take the two lowest as the bottom edge, rotate about the door's bottom
    corner by the angle between the edges."""
    door_bb = np.asarray(door_bb, np.float64)
    wall_bb = np.asarray(wall_bb, np.float64)
    d_sorted = door_bb[door_bb[:, 2].argsort()]
    w_sorted = wall_bb[wall_bb[:, 2].argsort()]
    door_vec = d_sorted[1] - d_sorted[0]
    wall_vec = w_sorted[1] - w_sorted[0]

    v1 = wall_vec / np.linalg.norm(wall_vec)
    v2 = door_vec / np.linalg.norm(door_vec)
    axis = np.cross(v1, v2)
    axis_norm = np.linalg.norm(axis)
    if axis_norm < 1e-12:
        return door_bb.copy()
    axis = axis / axis_norm
    angle = float(np.arccos(np.clip(np.dot(v1, v2), -1.0, 1.0)))

    q = np.asarray(
        quat.from_axis_angle(jnp.asarray(axis), jnp.asarray(-angle if flip else angle))
    )
    pivot = d_sorted[0]
    rotated = np.asarray(
        quat.rotate(jnp.asarray(q), jnp.asarray(door_bb - pivot))
    )
    return rotated + pivot
