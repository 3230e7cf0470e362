"""Batched geometric predicate kernels.

Capability parity with reference Fusion3DSeg/intersections.py (ray/line/plane
intersections, point-in-polygon, point-in-polyhedron, projections, ray-ray
closest points) re-expressed as jit/vmap-friendly einsum programs. The
fusion-critical primitive is `points_inside_polyhedra`
(reference intersections.py:146-164), the frustum-culling half-space test.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12  # normalization floor only — NOT for parallel tests
# parallel-ray/plane guard: f32 dots of unit-ish vectors carry rounding
# noise ~1e-7, so a 1e-12 test passes genuinely parallel geometry and
# returns huge finite t instead of the documented inf (review r3); scale
# the threshold to the operands instead
_PARALLEL_EPS = 1e-6


def points_inside_polyhedra(
    points: jax.Array, plane_points: jax.Array, plane_normals: jax.Array
) -> jax.Array:
    """Half-space sign test: which points lie inside a convex polyhedron.

    Matches reference intersections.point_inside_polyhedra (:146-164):
    inside <=> dot(p - plane_point_m, normal_m) >= 0 for every plane m.

    Args:
      points: [N, 3].
      plane_points: [M, 3] a point on each plane.
      plane_normals: [M, 3] inward normals.

    Returns:
      [N] bool mask.
    """
    # offsets d_m = n_m . p0_m lets the test run as one [N,3]@[3,M] matmul
    # instead of materializing the [N, M, 3] difference tensor the reference
    # builds (intersections.py:157) — O(N*M) memory -> O(N+M).
    d = jnp.sum(plane_points * plane_normals, axis=-1)  # [M]
    # full-f32 contraction: bf16 MXU default flips signs near plane boundaries
    dp = jnp.einsum("nc,mc->nm", points, plane_normals, precision="highest") - d
    return jnp.all(dp >= 0.0, axis=-1)


def ray_plane_intersections(
    ray_origins: jax.Array,
    ray_dirs: jax.Array,
    plane_point: jax.Array,
    plane_normal: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Intersection of N rays with one plane (reference intersections.py:41-63).

    Returns ([N, 3] points, [N] t parameters; t = inf where parallel).
    """
    denom = jnp.einsum("nc,c->n", ray_dirs, plane_normal, precision="highest")
    num = jnp.einsum(
        "nc,c->n", plane_point - ray_origins, plane_normal, precision="highest"
    )
    scale = jnp.linalg.norm(ray_dirs, axis=-1) * jnp.linalg.norm(plane_normal)
    t = jnp.where(jnp.abs(denom) > _PARALLEL_EPS * scale, num / denom, jnp.inf)
    return ray_origins + t[:, None] * ray_dirs, t


def lines_planes_intersections(
    line_points: jax.Array,
    line_dirs: jax.Array,
    plane_points: jax.Array,
    plane_normals: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """All-pairs [N lines] x [M planes] intersections (reference :66-94).

    Returns ([N, M, 3] points, [N, M] t; t = inf where parallel).
    """
    denom = jnp.einsum("nc,mc->nm", line_dirs, plane_normals, precision="highest")
    num = jnp.einsum(
        "nmc,mc->nm",
        plane_points[None] - line_points[:, None],
        plane_normals,
        precision="highest",
    )
    scale = (jnp.linalg.norm(line_dirs, axis=-1)[:, None]
             * jnp.linalg.norm(plane_normals, axis=-1)[None])
    t = jnp.where(jnp.abs(denom) > _PARALLEL_EPS * scale, num / denom, jnp.inf)
    return line_points[:, None] + t[..., None] * line_dirs[:, None], t


def points_in_polygon_sign(
    points: jax.Array, polygon: jax.Array, normal: jax.Array
) -> jax.Array:
    """Point-in-convex-polygon by consistent edge-cross sign (reference :97-119).

    Args:
      points: [N, 3] points assumed on the polygon's plane.
      polygon: [V, 3] vertices in order.
      normal: [3] polygon plane normal.

    Returns: [N] bool.
    """
    nxt = jnp.roll(polygon, -1, axis=0)
    edges = nxt - polygon  # [V, 3]
    to_pt = points[:, None, :] - polygon[None, :, :]  # [N, V, 3]
    crosses = jnp.cross(jnp.broadcast_to(edges[None], to_pt.shape), to_pt)
    side = jnp.einsum("nvc,c->nv", crosses, normal, precision="highest")
    return jnp.all(side >= 0, axis=-1) | jnp.all(side <= 0, axis=-1)


def plane_plane_direction(n1: jax.Array, n2: jax.Array) -> jax.Array:
    """Direction of the intersection line of two planes (reference :122-143)."""
    d = jnp.cross(n1, n2)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)


def project_points_to_plane(
    points: jax.Array, plane_point: jax.Array, plane_normal: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Perpendicular projection of points onto a plane (reference :167-204).

    Returns ([N, 3] projected points, [N] signed distances).
    """
    n = plane_normal / jnp.linalg.norm(plane_normal)
    dist = jnp.einsum("nc,c->n", points - plane_point, n, precision="highest")
    return points - dist[:, None] * n, dist


def ray_ray_closest_points(
    o1: jax.Array, d1: jax.Array, o2: jax.Array, d2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Closest points between two ray batches (reference :207-254).

    o1,d1,o2,d2: [N, 3]. Returns (points_on_ray1 [N,3], points_on_ray2 [N,3]).
    """
    r = o2 - o1
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    e = jnp.sum(d1 * r, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    denom = a * c - b * b
    t1 = jnp.where(jnp.abs(denom) > _EPS, (e * c - b * f) / denom, 0.0)
    t2 = jnp.where(jnp.abs(denom) > _EPS, (e * b - a * f) / denom, 0.0)
    return o1 + t1[:, None] * d1, o2 + t2[:, None] * d2
