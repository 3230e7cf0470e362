"""Procedural synthetic RTAB session: a room with labeled box objects.

The reference ships no test data (its test_data/rtab paths are not checked
in, SURVEY.md §4); parity/benchmark configs need a session with known
geometry and ground-truth labels. This generator ray-casts an axis-aligned
room (floor/ceiling/4 walls) containing labeled boxes from a circular camera
trajectory, producing exactly what `rtabmap-export` would: depth images,
per-pixel ground-truth class masks (standing in for the 2D segmentation
model's output), colors, poses, and intrinsics.

Coordinate convention matches the pipeline: camera looks down +z in camera
frame, world y is up. Ray casting is fully vectorized NumPy (host-side, done
once per config).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

# default semantic ids for the room surfaces (COCO panoptic contiguous ids:
# floor-wood, ceiling-merged, wall-other-merged)
FLOOR_CLASS = 87
CEILING_CLASS = 118
WALL_CLASS = 131
# door-stuff, window-blind, window-other, couch, tv, keyboard
DEFAULT_OBJECT_CLASSES = (86, 114, 115, 57, 62, 66)


@dataclass
class RoomSpec:
    size: Tuple[float, float, float] = (6.0, 2.8, 8.0)  # x (width), y (height), z (depth)
    num_objects: int = 6
    object_classes: Tuple[int, ...] = DEFAULT_OBJECT_CLASSES
    seed: int = 0


@dataclass
class SyntheticSession:
    depth: np.ndarray  # [F, H, W] meters (0 = invalid)
    gt_mask: np.ndarray  # [F, H, W] uint8 ground-truth class ids
    colors: np.ndarray  # [F, H, W, 3] uint8
    K: np.ndarray  # [3, 3] (depth resolution)
    quats_wxyz: np.ndarray  # [F, 4]
    translations: np.ndarray  # [F, 3]
    boxes: np.ndarray  # [B, 6] (min xyz, max xyz) of objects
    box_classes: np.ndarray  # [B]
    room: RoomSpec = field(default_factory=RoomSpec)

    @property
    def nframes(self):
        return len(self.depth)

    @property
    def depth_hw(self):
        return self.depth.shape[1:3]


def _look_rotation(forward: np.ndarray, up=np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """Camera->world rotation whose +z maps to `forward` (columns = axes)."""
    f = forward / np.linalg.norm(forward)
    r = np.cross(up, f)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    return np.stack([r, u, f], axis=1)  # columns: x=right, y=down-ish? up, z=fwd


def _mat_to_quat_wxyz(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s]
        )
    i = np.argmax(np.diag(R))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def _raycast(
    origins: np.ndarray,  # [3]
    dirs: np.ndarray,  # [N, 3]
    room: np.ndarray,  # [6] room min/max
    boxes: np.ndarray,  # [B, 6]
    box_classes: np.ndarray,
    max_depth: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (t_hit [N], class [N]) for rays inside the room."""
    n = len(dirs)
    t_best = np.full(n, max_depth)
    cls_best = np.zeros(n, np.uint8)

    inv = np.where(np.abs(dirs) > 1e-12, 1.0 / dirs, 1e12)

    # room interior: exit-face intersection (largest t where still inside)
    rmin, rmax = room[:3], room[3:]
    # for each axis, the far slab plane in ray direction
    t_far_axis = np.where(dirs > 0, (rmax - origins) * inv, (rmin - origins) * inv)
    exit_axis = np.argmin(t_far_axis, axis=1)
    t_exit = t_far_axis[np.arange(n), exit_axis]
    # classify the exit face: y-axis -> floor/ceiling, else wall
    face_cls = np.where(
        exit_axis == 1,
        np.where(dirs[:, 1] > 0, CEILING_CLASS, FLOOR_CLASS),
        WALL_CLASS,
    ).astype(np.uint8)
    hit = (t_exit > 0) & (t_exit < t_best)
    t_best[hit] = t_exit[hit]
    cls_best[hit] = face_cls[hit]

    # object boxes: slab-test entry intersection
    for b in range(len(boxes)):
        bmin, bmax = boxes[b, :3], boxes[b, 3:]
        t1 = (bmin - origins) * inv
        t2 = (bmax - origins) * inv
        tmin = np.max(np.minimum(t1, t2), axis=1)
        tmax = np.min(np.maximum(t1, t2), axis=1)
        hit = (tmax >= tmin) & (tmin > 1e-6) & (tmin < t_best)
        t_best[hit] = tmin[hit]
        cls_best[hit] = box_classes[b]

    return t_best, cls_best


_CLASS_COLOR_CACHE = {}


def _class_color(cls: int) -> np.ndarray:
    if cls not in _CLASS_COLOR_CACHE:
        rng = np.random.default_rng(cls)
        _CLASS_COLOR_CACHE[cls] = (rng.uniform(0.2, 1.0, 3) * 255).astype(np.uint8)
    return _CLASS_COLOR_CACHE[cls]


def make_session(
    nframes: int = 10,
    depth_hw: Tuple[int, int] = (256, 192),
    room: Optional[RoomSpec] = None,
    max_depth: float = 10.0,
    noise: float = 0.0,
) -> SyntheticSession:
    """Generate a session: circular trajectory inside the room, cameras
    looking outward, depth + ground-truth class mask per frame."""
    room = room or RoomSpec()
    rng = np.random.default_rng(room.seed)
    H, W = depth_hw
    sx, sy, sz = room.size
    room_box = np.array([0.0, 0.0, 0.0, sx, sy, sz])

    # objects: boxes on the floor along the walls (never blocking the center)
    boxes, bclasses = [], []
    for i in range(room.num_objects):
        cls = room.object_classes[i % len(room.object_classes)]
        w, h, d = rng.uniform(0.3, 1.2, 3) * np.array([1.0, 1.5, 1.0])
        # place near a wall
        side = i % 4
        if side == 0:
            x0, z0 = rng.uniform(0, sx - w), rng.uniform(0, 0.3)
        elif side == 1:
            x0, z0 = rng.uniform(0, sx - w), sz - d - rng.uniform(0, 0.3)
        elif side == 2:
            x0, z0 = rng.uniform(0, 0.3), rng.uniform(0, sz - d)
        else:
            x0, z0 = sx - w - rng.uniform(0, 0.3), rng.uniform(0, sz - d)
        boxes.append([x0, 0.0, z0, x0 + w, min(h, sy), z0 + d])
        bclasses.append(cls)
    boxes = np.asarray(boxes) if boxes else np.zeros((0, 6))
    bclasses = np.asarray(bclasses, np.uint8)

    f = 0.6 * W
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])

    # pixel ray directions in camera frame
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    rays_cam = np.stack(
        [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u)], -1
    ).reshape(-1, 3)

    center = np.array([sx / 2, sy * 0.55, sz / 2])
    r_traj = 0.25 * min(sx, sz)

    depths = np.zeros((nframes, H, W), np.float32)
    masks = np.zeros((nframes, H, W), np.uint8)
    colors = np.zeros((nframes, H, W, 3), np.uint8)
    quats = np.zeros((nframes, 4))
    trans = np.zeros((nframes, 3))

    for fidx in range(nframes):
        ang = 2 * np.pi * fidx / max(nframes, 1)
        eye = center + r_traj * np.array([np.cos(ang), 0.0, np.sin(ang)])
        fwd = np.array([np.cos(ang), -0.1, np.sin(ang)])  # look outward, slightly down
        R = _look_rotation(fwd)
        q = _mat_to_quat_wxyz(R)
        dirs = rays_cam @ R.T  # world-frame ray directions (unit z-depth scaled)

        t, cls = _raycast(eye, dirs, room_box, boxes, bclasses, max_depth)
        # depth = camera z distance: t * (z-component scale). rays_cam has
        # z=1 so camera depth = t * 1 along the camera z axis... t is the ray
        # parameter for P = eye + t*dir with dir = R@[x,y,1]; camera depth of
        # P is exactly t (z-component of R^T(P-eye) = t*1).
        d = t.reshape(H, W).astype(np.float32)
        if noise > 0:
            d = d * (1.0 + rng.normal(0, noise, d.shape).astype(np.float32))
        depths[fidx] = d
        masks[fidx] = cls.reshape(H, W)
        lut = np.zeros((256, 3), np.uint8)
        for c in np.unique(cls):
            lut[c] = _class_color(int(c))
        colors[fidx] = lut[cls].reshape(H, W, 3)
        quats[fidx] = q
        trans[fidx] = eye

    return SyntheticSession(
        depth=depths, gt_mask=masks, colors=colors, K=K,
        quats_wxyz=quats, translations=trans,
        boxes=boxes, box_classes=bclasses, room=room,
    )


def write_session_dir(session: SyntheticSession, out_dir, write_masks: bool = True) -> Path:
    """Materialize the session as an rtabmap-export-style directory tree:
    rgb/<i>.jpg, depth/<i>.png (16-bit mm), poses.txt, calibration.yaml,
    masks/<i>.png (ground-truth class ids standing in for 2D model output).
    """
    import cv2

    out_dir = Path(out_dir)
    (out_dir / "rgb").mkdir(parents=True, exist_ok=True)
    (out_dir / "depth").mkdir(exist_ok=True)
    if write_masks:
        (out_dir / "masks").mkdir(exist_ok=True)

    lines = []
    for i in range(session.nframes):
        cv2.imwrite(str(out_dir / "rgb" / f"{i}.jpg"), session.colors[i][:, :, ::-1])
        dmm = np.clip(session.depth[i] * 1000.0, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(out_dir / "depth" / f"{i}.png"), dmm)
        if write_masks:
            cv2.imwrite(str(out_dir / "masks" / f"{i}.png"), session.gt_mask[i])
        q = session.quats_wxyz[i]
        t = session.translations[i]
        # RGBD-SLAM + ID: timestamp x y z qx qy qz qw id
        lines.append(
            f"{float(i)} {t[0]} {t[1]} {t[2]} {q[1]} {q[2]} {q[3]} {q[0]} {i}"
        )
    (out_dir / "poses.txt").write_text("\n".join(lines) + "\n")

    K = session.K
    calib = (
        "%YAML:1.0\n---\n"
        "camera_matrix:\n   rows: 3\n   cols: 3\n"
        f"   data: [{K[0,0]}, 0., {K[0,2]}, 0., {K[1,1]}, {K[1,2]}, 0., 0., 1.]\n"
    )
    (out_dir / "calibration.yaml").write_text(calib)
    return out_dir
