"""Batched quaternion math in JAX.

Capability parity with the reference's SpatQuadranion
(reference RTAB_utils/spatQuad.py:7-58): rotate [N,3] point batches by a unit
quaternion, inverse rotation, vec-to-vec quaternion, euler->quat. Re-designed
as pure functions over (..., 4) wxyz arrays so they vmap/jit over frame axes —
the reference wraps pyquaternion objects in Python loops
(camera_utils.py:127-131); here a whole pose trajectory rotates in one fused
einsum program.

Convention: quaternions are (w, x, y, z), matching the reference's
`wxyzs = xyzws[:, [3, 0, 1, 2]]` unpacking (fusion.py:72).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit length. q: (..., 4)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conjugate(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions). q: (..., 4) wxyz."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


inverse = conjugate  # unit quaternions throughout


def multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2. Broadcasts over leading dims. (..., 4)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotate(q: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points by unit quaternion(s): p' = q p q*.

    Uses the Rodrigues-style expansion p' = p + 2 w (v × p) + 2 v × (v × p),
    which is 2 cross products instead of 2 full Hamilton products — fewer
    flops and fully vectorized on the VPU.

    Args:
      q: (..., 4) wxyz unit quaternion(s).
      p: (..., N, 3) points; q's leading dims broadcast against p's.

    Returns:
      (..., N, 3) rotated points.
    """
    w = q[..., :1]  # (..., 1)
    v = q[..., 1:]  # (..., 3)
    w = w[..., None, :]  # (..., 1, 1)
    v = v[..., None, :]  # (..., 1, 3)
    vxp = jnp.cross(v, p)
    return p + 2.0 * (w * vxp + jnp.cross(v, vxp))


def rotate_inverse(q: jax.Array, p: jax.Array) -> jax.Array:
    """Rotate points by the inverse of q (world -> camera)."""
    return rotate(conjugate(q), p)


def to_rotation_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3, 3) rotation matrix.

    Used to fold pose rotation into the camera-projection matmul so the whole
    world->pixel transform becomes a single [N,3]@[3,3] MXU contraction
    (replaces the reference's per-call pyquaternion rotate,
    camera_utils.py:21-23).
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit quaternion rotating by `angle` around `axis`. (...,3),(...) -> (...,4)."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def between_vectors(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Quaternion rotating v1 onto v2 (reference spatQuad.py:36-47).

    Numerically stable half-way construction (no arccos): q = [d + |v1||v2|,
    v1 × v2], normalized — avoids the reference's NaN at parallel vectors.
    """
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v2 = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
    w = 1.0 + jnp.sum(v1 * v2, axis=-1, keepdims=True)
    xyz = jnp.cross(v1, v2)
    q = jnp.concatenate([w, xyz], axis=-1)
    # ANTIparallel vectors give the zero quaternion (w = 0, cross = 0) —
    # normalize would return NaN. Substitute a 180-degree rotation about
    # an axis orthogonal to v1 (whichever of x/z is less aligned with it).
    degenerate = jnp.linalg.norm(q, axis=-1, keepdims=True) < 1e-6
    ex = jnp.zeros_like(v1).at[..., 0].set(1.0)
    ez = jnp.zeros_like(v1).at[..., 2].set(1.0)
    alt = jnp.where(
        jnp.abs(v1[..., :1]) < 0.9, jnp.cross(v1, ex), jnp.cross(v1, ez)
    )
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-12)
    q180 = jnp.concatenate([jnp.zeros_like(w), alt], axis=-1)
    return normalize(jnp.where(degenerate, q180, q))


def from_euler(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Euler (roll, pitch, yaw) -> wxyz quaternion (reference spatQuad.py:52-58)."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )
