"""Oriented bounding boxes and intersection-driven instance merging.

Capability parity with reference merge_intersecting_bb.py + the per-instance
OBB computation of get3DSeg.master_classes (:424-448). The reference builds
one open3d OrientedBoundingBox per instance and intersects instances by
comparing point-index membership lists in an O(K^2) Python loop
(merge_intersecting_bb.py:68-91,113-120). TPU re-design (SURVEY.md §7.5):

  * PCA OBBs for all K instances at once via masked segment reductions
    (mean + 3x3 covariance) and a batched [K,3,3] eigendecomposition;
  * the membership test "cloud points inside box k" as one [N,3] x [K,3,3]
    rotation einsum + extent compare -> inside [K, N] bool;
  * the reference's pairwise criterion — two boxes intersect iff some cloud
    point lies inside both — becomes inside @ inside.T, a single
    [K,N]@[N,K] MXU matmul;
  * the final merge of same-parent intersecting boxes is a tiny host-side
    union-find (K is small), avoiding the reference's list-del index-shift
    bug (merge_intersecting_bb.py:113-120).

Note: open3d's create_from_points computes an approximate minimum-volume box;
PCA boxes differ in corner values but provide the same capability. Extents
are padded by `eps` so instance member points sit strictly inside their box.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_instances",))
def instance_obbs(
    points: jax.Array,
    ids: jax.Array,
    num_instances: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """PCA oriented bounding boxes for every instance id at once.

    Args:
      points: [N, 3].
      ids: [N] int32 instance id per point in [0, num_instances); negative ids
        are ignored.
      num_instances: K (static).

    Returns:
      centers [K, 3], axes [K, 3, 3] (rows = box axes), half_extents [K, 3],
      counts [K] int32. Boxes of empty/degenerate instances have zero extents.
    """
    K = num_instances
    ok = ids >= 0
    seg = jnp.where(ok, ids, K)
    w = ok.astype(jnp.float32)

    cnt = jax.ops.segment_sum(w, seg, num_segments=K + 1)
    psum = jax.ops.segment_sum(points * w[:, None], seg, num_segments=K + 1)
    mean = psum / jnp.maximum(cnt[:, None], 1.0)

    centered = points - mean[jnp.clip(seg, 0, K - 1)]
    outer = centered[:, :, None] * centered[:, None, :] * w[:, None, None]
    cov = jax.ops.segment_sum(outer, seg, num_segments=K + 1)
    cov = cov / jnp.maximum(cnt[:, None, None], 1.0)

    # batched symmetric eigendecomposition; columns of V are principal axes
    _, vecs = jnp.linalg.eigh(cov[:K] + 1e-9 * jnp.eye(3))
    axes = jnp.swapaxes(vecs, -1, -2)  # [K, 3, 3], rows = axes

    # project member points onto their instance's axes for tight extents
    proj = jnp.einsum(
        "nc,nkc->nk", centered, axes[jnp.clip(seg, 0, K - 1)], precision="highest"
    )
    big = jnp.float32(3.0e38)
    pmax = jax.ops.segment_max(jnp.where(ok[:, None], proj, -big), seg, num_segments=K + 1)
    pmin = jax.ops.segment_min(jnp.where(ok[:, None], proj, big), seg, num_segments=K + 1)
    pmax, pmin = pmax[:K], pmin[:K]
    empty = cnt[:K] < 1
    pmax = jnp.where(empty[:, None], 0.0, pmax)
    pmin = jnp.where(empty[:, None], 0.0, pmin)

    half = (pmax - pmin) / 2.0
    centers = mean[:K] + jnp.einsum(
        "kc,kcd->kd", (pmax + pmin) / 2.0, axes, precision="highest"
    )
    return centers, axes, half, cnt[:K].astype(jnp.int32)


def obb_corners(centers: jax.Array, axes: jax.Array, half: jax.Array) -> jax.Array:
    """[K,3],[K,3,3],[K,3] -> [K, 8, 3] corner points."""
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32,
    )  # [8, 3]
    offs = jnp.einsum("sc,kc,kcd->ksd", signs, half, axes, precision="highest")
    return centers[:, None, :] + offs


@partial(jax.jit, static_argnames=("num_instances",))
def instance_obb_corners(
    points: jax.Array, ids: jax.Array, num_instances: int
) -> Tuple[jax.Array, jax.Array]:
    """Fused boxes + corners in ONE device program: standalone calls carry
    30-90 ms dispatch latency through the remote-device tunnel, so the
    pipeline call sites (master_classes, merge_bb) take (corners [K,8,3],
    counts [K]) from a single dispatch instead of two."""
    centers, axes, half, cnt = instance_obbs(points, ids, num_instances)
    return obb_corners(centers, axes, half), cnt


def points_inside_obbs(
    points: jax.Array,
    centers: jax.Array,
    axes: jax.Array,
    half: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Membership of every point in every box: [K, N] bool.

    Mirrors open3d get_point_indices_within_bounding_box as used by
    reference merge_intersecting_bb.py:76,87 (full-cloud membership test).
    """
    rel = points[None, :, :] - centers[:, None, :]  # [K, N, 3]
    local = jnp.einsum("knc,kdc->knd", rel, axes, precision="highest")  # [K, N, 3]
    return jnp.all(jnp.abs(local) <= (half[:, None, :] + eps), axis=-1)


@partial(jax.jit, static_argnames=("num_instances",))
def obb_intersection_matrix(
    points: jax.Array, ids: jax.Array, num_instances: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused: per-instance OBBs + the [K, K] co-membership intersection matrix.

    intersect[i, j] = True iff some cloud point lies inside both box i and
    box j (the reference's criterion, merge_intersecting_bb.py:88-90).
    Instances with < 4 points never intersect (reference :72-73 skips them).

    Returns (intersect [K,K] bool, centers, axes, half_extents, counts).
    """
    centers, axes, half, cnt = instance_obbs(points, ids, num_instances)
    inside = points_inside_obbs(points, centers, axes, half)  # [K, N]
    insf = inside.astype(jnp.float32)
    co = insf @ insf.T  # MXU co-membership counts
    ok = cnt >= 4
    intersect = (co > 0) & ok[:, None] & ok[None, :]
    return intersect, centers, axes, half, cnt


# Host-vs-device crossover for the batched-OBB entry points: below this
# K*N the host NumPy path beats the device program outright — the whole
# compute (~K*N*20 flops) costs less than one remote dispatch (30-90 ms
# tunnel latency) plus the [N] ids upload. 3e7 ~= 20 MFLOP ~= 15-30 ms on
# this host's single core (docs/ROUND4.md item 3).
HOST_OBB_MAX_KN = 3.0e7


def instance_obbs_np(
    points: np.ndarray, ids: np.ndarray, num_instances: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host NumPy counterpart of `instance_obbs` (same returns, f64 math).

    The box fit loops over the K instances (boolean-mask selects); the cost
    that actually scales — membership and co-membership — stays vectorized
    in `obb_intersection_matrix_np`. Intended for the small-K pipeline
    regime where a device dispatch costs more than the whole host compute
    (see obb_intersection_matrix_np)."""
    K = num_instances
    pts = np.asarray(points, np.float64)
    ids = np.asarray(ids)
    centers = np.zeros((K, 3), np.float32)
    axes = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    half = np.zeros((K, 3), np.float32)
    cnt = np.zeros(K, np.int32)
    for k in range(K):
        member = pts[ids == k]
        cnt[k] = len(member)
        if cnt[k] < 1:
            continue
        c, a, h = pca_obb_np(member)
        centers[k], axes[k], half[k] = c, a, h
    return centers, axes, half, cnt


def instance_obb_corners_np(
    points: np.ndarray, ids: np.ndarray, num_instances: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host counterpart of `instance_obb_corners`: (corners [K,8,3] f32,
    counts [K] int32) with zero device contact — the right path when
    K*N <= HOST_OBB_MAX_KN and the points already live on host
    (pipeline/get3dseg.master_classes loads them from a ply)."""
    centers, axes, half, cnt = instance_obbs_np(points, ids, num_instances)
    corners = np.stack([
        obb_corners_np(centers[k], axes[k], half[k])
        for k in range(num_instances)
    ]) if num_instances else np.zeros((0, 8, 3), np.float32)
    return corners.astype(np.float32), cnt


def obb_intersection_matrix_np(
    points: np.ndarray, ids: np.ndarray, num_instances: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host counterpart of `obb_intersection_matrix` — same criterion, same
    returns, NumPy end to end.

    Rationale (VERDICT r3 #3, e2e floor): at pipeline scale (K ~ 10
    instances, N ~ 100k points) the whole computation is ~20 MFLOP — less
    host time than ONE remote-device dispatch (30-90 ms tunnel latency)
    plus the [N] ids upload at ~20-40 MB/s. merge_bb already holds the
    points on host, so the host path costs zero transfers. The device path
    remains the right choice when K*N grows past the host's arithmetic
    (merge_bb's `backend="auto"` picks by that product)."""
    pts = np.asarray(points, np.float64)
    centers, axes, half, cnt = instance_obbs_np(pts, ids, num_instances)
    # membership [K, N]: rotate into each box frame, compare to extents
    rel = pts[None, :, :] - centers.astype(np.float64)[:, None, :]
    local = np.einsum("knc,kdc->knd", rel, axes.astype(np.float64))
    inside = np.all(np.abs(local) <= (half[:, None, :] + 1e-5), axis=-1)
    co = inside.astype(np.float32) @ inside.astype(np.float32).T
    ok = cnt >= 4
    intersect = (co > 0) & ok[:, None] & ok[None, :]
    return intersect, centers, axes, half, cnt


def pca_obb_np(pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host NumPy PCA OBB over one instance's member points — the same math
    as `instance_obbs` for a single id. Used by merge_bb to re-derive the
    few boxes that changed after a merge WITHOUT a second device dispatch
    (each standalone program call costs 30-90 ms through the tunnel; the
    host recompute over <=N member points is sub-millisecond at K~10)."""
    pts = np.asarray(pts, np.float64)
    mean = pts.mean(axis=0)
    c = pts - mean
    cov = (c.T @ c) / len(pts)
    _, vecs = np.linalg.eigh(cov + 1e-9 * np.eye(3))
    axes = vecs.T  # rows = box axes
    proj = c @ axes.T
    pmax, pmin = proj.max(axis=0), proj.min(axis=0)
    half = (pmax - pmin) / 2.0
    center = mean + ((pmax + pmin) / 2.0) @ axes
    return (center.astype(np.float32), axes.astype(np.float32),
            half.astype(np.float32))


def obb_corners_np(center: np.ndarray, axes: np.ndarray,
                   half: np.ndarray) -> np.ndarray:
    """Host counterpart of `obb_corners` for one box: [8, 3] corners."""
    signs = np.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    return np.asarray(center)[None, :] + (signs * np.asarray(half)) @ np.asarray(axes)


def merge_intersecting_instances(
    intersect: np.ndarray,
    parent_ids: np.ndarray,
    mergeable: np.ndarray,
) -> np.ndarray:
    """Union-find merge of same-parent intersecting instances (host side).

    Args:
      intersect: [K, K] bool intersection matrix.
      parent_ids: [K] parent class per instance (-1 = no parent; never merged,
        mirroring the reference's skip of out-of-taxonomy instances).
      mergeable: [K] bool — e.g. excludes the background id 0 (the reference
        loops from id 1, merge_intersecting_bb.py:113).

    Returns:
      root: [K] int — representative instance id for each instance.
    """
    K = len(parent_ids)
    root = np.arange(K)

    def find(a):
        while root[a] != a:
            root[a] = root[root[a]]
            a = root[a]
        return a

    ii, jj = np.nonzero(np.triu(intersect, k=1))
    for a, b in zip(ii, jj):
        if not (mergeable[a] and mergeable[b]):
            continue
        if parent_ids[a] < 0 or parent_ids[a] != parent_ids[b]:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            root[max(ra, rb)] = min(ra, rb)
    for a in range(K):
        root[a] = find(a)
    return root
