"""NumPy oracle implementing the reference semantics (SURVEY.md §4).

Independent re-implementations of the reference's numerical contracts
(projection camera_utils.py:9-26, voting voting.py:92-137, polyhedron test
intersections.py:146-164, BFS flood fill cv.py:425-440) used as ground truth
for parity tests and as the CPU baseline for bench.py. Written from the
documented semantics, not copied.
"""

from __future__ import annotations

import numpy as np


def quat_rotate(q_wxyz: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Rotate [N,3] points by a wxyz quaternion (matches spatQuad rotate)."""
    w, x, y, z = q_wxyz
    v = np.array([x, y, z])
    vxp = np.cross(v, p)
    return p + 2.0 * (w * vxp + np.cross(v, vxp))


def project_points(points, K, q_wxyz, t):
    """World -> floor-int pixel uv + camera depth (camera_utils.py:9-26)."""
    qc = np.array([q_wxyz[0], -q_wxyz[1], -q_wxyz[2], -q_wxyz[3]])
    cam = quat_rotate(qc, points - t)
    proj = K @ cam.T
    uv = np.floor(proj[:2] / proj[2:3]).astype(np.int32)
    return uv[0], uv[1], cam[:, 2]


def backproject(depth, K):
    """Depth image -> camera points, row-major (ios_rtab.py:168-177)."""
    h, w = depth.shape
    u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x = (u - K[0, 2]) * depth / K[0, 0]
    y = (v - K[1, 2]) * depth / K[1, 1]
    return np.stack([x, y, depth], -1).reshape(-1, 3)


def point_inside_polyhedra(points, plane_points, normals):
    """Half-space test (intersections.py:146-164)."""
    pv = points[:, None, :] - plane_points[None, :, :]
    dp = np.einsum("nmc,mc->nm", pv, normals)
    return np.all(dp >= 0, axis=1)


def vote(votes, uv2pt, mask):
    """One frame's duplicate-collapsing fancy-index vote (voting.py:92-98)."""
    valid = uv2pt != -1
    votes[uv2pt[valid], mask[valid]] += 1  # NumPy collapses duplicates
    return votes


def vote_add_at(votes, uv2pt, mask):
    """np.add.at counting semantics (every pixel counts)."""
    valid = uv2pt != -1
    np.add.at(votes, (uv2pt[valid], mask[valid]), 1)
    return votes


def classify(votes, threshold, nclasses, filter_classes=None):
    """Thresholded argmax (voting.py:106-137)."""
    votes = votes.astype(np.float64)
    total = votes.sum(-1)
    cand = votes if filter_classes is None else votes[:, filter_classes]
    valid = total > 0

    cls = np.argmax(cand, axis=1)
    vmax = cand[np.arange(len(cand)), cls]
    cls[~valid] = nclasses
    prob = vmax[valid] / total[valid]
    cls[np.where(valid)[0][prob < threshold]] = nclasses
    cls[vmax == 0] = nclasses
    if filter_classes is not None:
        out = cls.copy()
        for i, c in enumerate(filter_classes):
            out[cls == i] = c
        cls = out
    return cls


def flood_fill_components(classes, adj_lists):
    """Per-class BFS connected components (cv.py:425-440).

    Returns [N] component label = minimum point index in the component.
    """
    n = len(classes)
    label = np.full(n, -1, np.int64)
    for seed in range(n):
        if label[seed] >= 0:
            continue
        comp = [seed]
        label[seed] = seed
        queue = [seed]
        while queue:
            p = queue.pop()
            for q in adj_lists[p]:
                if label[q] < 0 and classes[q] == classes[p]:
                    label[q] = seed
                    comp.append(q)
                    queue.append(q)
    return label


def radius_neighbors(points, r):
    """Brute-force radius adjacency lists (fusion.py:374-375 semantics)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    return tree.query_ball_point(points, r)
