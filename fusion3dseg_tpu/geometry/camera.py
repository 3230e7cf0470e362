"""Camera geometry kernels: projection, back-projection, frustums.

Capability parity with reference Fusion3DSeg/camera_utils.py. The key
re-design: the world->pixel transform is expressed as one fused
[N,3] @ [3,3] matmul per frame (pose rotation and intrinsics pre-multiplied
into a single matrix) instead of quaternion-object rotation followed by a
K @ p.T product (reference camera_utils.py:9-26). Everything vmaps over a
frame axis so a whole session projects in a single XLA program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fusion3dseg_tpu.geometry import quaternion as quat


def project_points(
    points: jax.Array,
    K: jax.Array,
    q_wxyz: jax.Array,
    translation: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """World points -> integer pixel coordinates + camera-frame depth.

    Semantics match reference camera_utils.points2pixel (:9-26): subtract the
    camera translation, rotate by the inverse pose quaternion, apply K,
    perspective-divide, floor to int32. The reference returns only uv [2,N]
    and has no occlusion handling; we additionally return the camera-frame
    depth z so callers can z-buffer (see ops/zbuffer.py) and a validity hint.

    Args:
      points: [N, 3] world xyz.
      K: [3, 3] intrinsics.
      q_wxyz: [4] camera pose rotation (camera->world), wxyz.
      translation: [3] camera position.

    Returns:
      u, v: [N] int32 pixel coords (floor, unclamped like the reference).
      z:    [N] float camera-frame depth (positive in front of the camera).
    """
    R = quat.to_rotation_matrix(quat.conjugate(q_wxyz))  # world->camera
    M = jnp.einsum("ij,jk->ik", K, R, precision="highest")  # fused projection matrix
    # precision='highest' keeps the contraction in full f32: the TPU default
    # (bf16 MXU passes) costs whole pixels of error on this 3-wide matmul,
    # and at inner dim 3 the op is bandwidth-bound anyway.
    rel = points - translation
    p = jnp.einsum("nc,dc->nd", rel, M, precision="highest")
    z = jnp.einsum("nc,c->n", rel, R[2], precision="highest")
    uv = p[:, :2] / p[:, 2:3]
    # +1e-4 px guards the floor() against f32 round-down at exact-integer
    # boundaries (back-projected pixels land exactly on integers; without the
    # nudge a third of them floor to u-1). Flips a random fraction only with
    # probability ~1e-4 per pixel.
    uv = jnp.floor(uv + 1e-4).astype(jnp.int32)
    return uv[:, 0], uv[:, 1], z


# Whole-session projection: vmap over the frame axis of poses.
project_points_all_frames = jax.vmap(project_points, in_axes=(None, None, 0, 0))


def backproject_depth(
    depth: jax.Array,
    K: jax.Array,
) -> jax.Array:
    """Depth image -> camera-frame point cloud (pinhole back-projection).

    Semantics match reference RTAB_utils/ios_rtab.py:168-177 (__getRGBP3d):
    x = (u - cx) * depth / fx, y = (v - cy) * depth / fy, z = depth. The
    meshgrid is built with broadcasted_iota (TPU-friendly) and the whole image
    back-projects as one elementwise program; vmap for the frame axis.

    Args:
      depth: [H, W] depth (same units the caller wants back; callers apply
        the mm->m /1000 rescale themselves, mirroring ios_rtab.py:185).
      K: [3, 3] intrinsics scaled to the depth resolution.

    Returns:
      [H*W, 3] camera-frame points in row-major pixel order.
    """
    h, w = depth.shape
    u = jax.lax.broadcasted_iota(depth.dtype, (h, w), 1)
    v = jax.lax.broadcasted_iota(depth.dtype, (h, w), 0)
    x = (u - K[0, 2]) * depth / K[0, 0]
    y = (v - K[1, 2]) * depth / K[1, 1]
    pts = jnp.stack([x, y, depth], axis=-1)
    return pts.reshape(-1, 3)


backproject_depth_all_frames = jax.vmap(backproject_depth, in_axes=(0, None))


def camera_to_world(
    points: jax.Array, q_wxyz: jax.Array, translation: jax.Array
) -> jax.Array:
    """Camera-frame points -> world frame: R p + t.

    Replaces the per-frame Python loop of reference camera_utils.camera2world
    (:96-132); vmap over leading frame dims of (q, t) for whole sessions.
    points [..., N, 3], q [..., 4], t [..., 3].
    """
    return quat.rotate(q_wxyz, points) + translation[..., None, :]


def camera_frustum_corners(K: jax.Array, width: int, height: int) -> jax.Array:
    """Camera-frame frustum pyramid directions.

    Reference camera_utils.get_camera_frustum (:60-93) builds
    [eye, bl, br, tr, tl, lookat] by K^-1 on pixel-corner homogeneous points.
    Same construction here; corners are at unit depth in camera frame.

    Returns: [6, 3] camera-frame points (eye at origin).
    """
    Kinv = jnp.linalg.inv(K)
    pix = jnp.asarray(
        [
            [0.0, 0.0, 0.0],  # eye
            [0.0, 0.0, 1.0],
            [width, 0.0, 1.0],
            [width, height, 1.0],
            [0.0, height, 1.0],
            [width / 2.0, height / 2.0, 1.0],  # lookat
        ],
        dtype=K.dtype,
    )
    return jnp.einsum("nc,dc->nd", pix, Kinv, precision="highest")


def frustum_world_planes(
    K: jax.Array,
    width: int,
    height: int,
    q_wxyz: jax.Array,
    translation: jax.Array,
    max_depth: float,
) -> Tuple[jax.Array, jax.Array]:
    """Five inward-facing half-space planes bounding one camera's view volume.

    Combines reference camera_utils.get_frustum_face_normals (:153-171) —
    4 side planes through the eye, normals = cross(eye->corner_i,
    eye->corner_{i+1}) — with the far plane added by the fusion loop
    (reference fusion.py:255-258: point eye + max_depth * lookat, normal
    -lookat).

    Args:
      q_wxyz: [4] or [F, 4] pose rotation; translation [3] or [F, 3].

    Returns:
      plane_points [.., 5, 3], plane_normals [.., 5, 3] (unit, inward).
    """
    cam = camera_frustum_corners(K, width, height)  # [6,3] camera frame
    world = camera_to_world(cam, q_wxyz, translation)  # [..,6,3]
    eye = world[..., 0, :]
    corners = world[..., 1:5, :]
    lookvec = world[..., 5, :] - eye
    lookat = lookvec / jnp.linalg.norm(lookvec, axis=-1, keepdims=True)

    nxt = jnp.roll(corners, shift=-1, axis=-2)
    e2a = corners - eye[..., None, :]
    e2b = nxt - eye[..., None, :]
    normals = jnp.cross(e2a, e2b)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)

    far_pt = eye + max_depth * lookat
    far_n = -lookat
    plane_pts = jnp.concatenate(
        [jnp.broadcast_to(eye[..., None, :], corners.shape), far_pt[..., None, :]],
        axis=-2,
    )
    plane_ns = jnp.concatenate([normals, far_n[..., None, :]], axis=-2)
    return plane_pts, plane_ns
