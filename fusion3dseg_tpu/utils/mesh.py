"""Mesh / point-cloud utilities (open3d-free).

Capability parity with reference segUtils/meshUtils.py (SURVEY.md §2.16)
re-built on plain numpy + io/ply: geometry constructors, vertex<->triangle
maps, face removal/keep by vertex mask, OBB axes, connected triangle
clusters, per-class triangle colors, uv-texture -> vertex colors, texture
rasterization, batch image reading, vector angles. The reference's
interactive open3d pickers (pick_points :470-485, ROI drag-select :488-551)
become batch geometric queries: nearest-point lookup and box/polygon
selection over arrays (SURVEY.md §7.7 — seed lists replace interactive
picking; any UI can layer on top).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from fusion3dseg_tpu.io import ply


# ---------------------------- constructors ---------------------------------


def to_pcd(points, colors=None, normals=None, save=None):
    """Assemble a point-cloud dict; optionally write .ply (reference to_pcd
    :36-? writes+shows; viz here is headless by design)."""
    pcd = {"points": np.asarray(points), "colors": colors, "normals": normals}
    if save is not None:
        ply.write_point_cloud(save, pcd["points"], colors=colors, normals=normals)
    return pcd


def to_mesh(vertices, triangles, vertex_colors=None, save=None):
    mesh = {
        "vertices": np.asarray(vertices),
        "triangles": np.asarray(triangles, np.int32),
        "vertex_colors": vertex_colors,
    }
    if save is not None:
        ply.write_mesh(save, mesh["vertices"], mesh["triangles"], vertex_colors)
    return mesh


def to_lines(points, edges, colors=None):
    """Line-set dict (reference to_lines): points [N,3], edges [E,2]."""
    return {"points": np.asarray(points), "edges": np.asarray(edges, np.int32), "colors": colors}


def read_camera_json(path):
    """Read an open3d-style PinholeCameraParameters JSON (reference
    meshUtils.py:10-33 loads these for viewer poses).

    Returns (K [3,3], extrinsic [4,4], width, height). open3d stores
    intrinsic_matrix column-major.
    """
    import json

    with open(path) as fp:
        data = json.load(fp)
    if "intrinsic" in data:  # PinholeCameraParameters wrapper
        intr = data["intrinsic"]
        extr = np.asarray(data.get("extrinsic", np.eye(4).ravel()), float)
    else:  # bare PinholeCameraIntrinsic
        intr = data
        extr = np.eye(4).ravel()
    K = np.asarray(intr["intrinsic_matrix"], float).reshape(3, 3, order="F")
    extrinsic = extr.reshape(4, 4, order="F")
    return K, extrinsic, int(intr["width"]), int(intr["height"])


# ------------------------ vertex / triangle maps ---------------------------


def vertex_triangle_maps(triangles: np.ndarray, num_vertices: int):
    """CSR vertex->triangles map + triangle->vertices (reference :235-259).

    Returns (offsets [V+1], tri_ids [3T] grouped by vertex)."""
    triangles = np.asarray(triangles, np.int64)
    t_ids = np.repeat(np.arange(len(triangles)), 3)
    verts = triangles.reshape(-1)
    order = np.argsort(verts, kind="stable")
    offsets = np.searchsorted(verts[order], np.arange(num_vertices + 1))
    return offsets, t_ids[order]


def keep_faces_by_vertex_mask(
    vertices: np.ndarray, triangles: np.ndarray, keep_vertices: np.ndarray,
    require_all: bool = True,
):
    """Drop faces touching removed vertices and reindex (reference remove/
    keep faces :262-333). require_all: face kept only if all 3 verts kept."""
    keep_vertices = np.asarray(keep_vertices, bool)
    fv = keep_vertices[triangles]
    face_keep = fv.all(-1) if require_all else fv.any(-1)
    # faces kept may still reference dropped vertices when require_all=False;
    # keep every vertex referenced by a kept face
    used = np.zeros(len(vertices), bool)
    used[np.asarray(triangles)[face_keep].reshape(-1)] = True
    remap = np.cumsum(used) - 1
    new_tris = remap[np.asarray(triangles)[face_keep]]
    return vertices[used], new_tris.astype(np.int32), used, face_keep


def connected_triangle_clusters(triangles: np.ndarray, num_vertices: int) -> np.ndarray:
    """Label triangles by vertex-connected component (reference :360-375).

    Returns [T] int cluster ids (root triangle index)."""
    triangles = np.asarray(triangles, np.int64)
    T = len(triangles)
    offsets, tids = vertex_triangle_maps(triangles, num_vertices)

    # fast path: express "triangles sharing a vertex" as a CSR graph
    # (each triangle's 3 vertex groups contribute an edge to the group's
    # first triangle) and run the native union-find — the pure-Python
    # per-vertex loop below costs seconds at scan-mesh scale
    try:
        from fusion3dseg_tpu.io import native

        firsts = np.full(num_vertices, -1, np.int64)
        nz = offsets[:-1] < offsets[1:]
        firsts[nz] = tids[offsets[:-1][nz]]
        # edges: triangle t -> first triangle of each of its vertices
        edge_dst = firsts[triangles.reshape(-1)].astype(np.int32)
        off3 = (np.arange(T + 1, dtype=np.int32) * 3)
        labels = native.components_from_csr(off3, edge_dst)
        if labels is not None:
            return labels.astype(np.int64)
    except Exception:
        pass

    root = np.arange(T)

    def find(a):
        while root[a] != a:
            root[a] = root[root[a]]
            a = root[a]
        return a

    # union triangles sharing a vertex via the CSR map
    for v in range(num_vertices):
        group = tids[offsets[v] : offsets[v + 1]]
        for k in range(1, len(group)):
            ra, rb = find(group[0]), find(group[k])
            if ra != rb:
                root[max(ra, rb)] = min(ra, rb)
    for t in range(T):
        root[t] = find(t)
    return root


def triangle_colors_by_class(triangles, vertex_classes, palette):
    """Majority-class color per triangle (reference :378-392)."""
    vc = np.asarray(vertex_classes)[np.asarray(triangles)]  # [T, 3]
    maj = np.where(
        vc[:, 0] == vc[:, 1], vc[:, 0], np.where(vc[:, 1] == vc[:, 2], vc[:, 1], vc[:, 0])
    )
    return np.asarray(palette)[maj], maj


# ----------------------------- OBB helpers ---------------------------------


def obb_axes(points: np.ndarray):
    """PCA OBB (center, axes rows, half extents) of one point set
    (reference get_obb_axes :336-357). Thin wrapper over ops/obb.py."""
    import jax.numpy as jnp

    from fusion3dseg_tpu.ops import obb as obb_ops

    pts = np.asarray(points, np.float32)
    centers, axes, half, _ = obb_ops.instance_obbs(
        jnp.asarray(pts), jnp.zeros(len(pts), jnp.int32), 1
    )
    return np.asarray(centers)[0], np.asarray(axes)[0], np.asarray(half)[0]


# --------------------------- texture utilities -----------------------------


def uv_texture_to_vertex_colors(uvs: np.ndarray, texture: np.ndarray) -> np.ndarray:
    """Sample a texture at per-vertex uv coords -> [V, 3] colors in [0,1]
    (reference uv mesh coloring :203-232). uvs in [0,1], origin bottom-left."""
    h, w = texture.shape[:2]
    uvs = np.asarray(uvs)
    x = np.clip((uvs[:, 0] * (w - 1)).round().astype(int), 0, w - 1)
    y = np.clip(((1 - uvs[:, 1]) * (h - 1)).round().astype(int), 0, h - 1)
    cols = texture[y, x]
    if cols.dtype == np.uint8:
        cols = cols.astype(np.float64) / 255.0
    return cols


def rasterize_triangles_uv(
    uvs: np.ndarray, triangles: np.ndarray, values, texture_hw: Tuple[int, int]
):
    """Rasterize per-triangle values into a texture via fillPoly
    (reference :395-426)."""
    import cv2

    h, w = texture_hw
    tex = np.zeros((h, w, 3), np.uint8)
    pix = np.stack(
        [uvs[:, 0] * (w - 1), (1 - uvs[:, 1]) * (h - 1)], axis=-1
    ).astype(np.int32)
    values = np.asarray(values)
    for t, tri in enumerate(np.asarray(triangles)):
        cv2.fillPoly(tex, [pix[tri]], tuple(int(c) for c in values[t]))
    return tex


def read_images(dirname, extension="png", grayscale=False):
    """Batch image reader (reference :429-452)."""
    import cv2

    files = sorted(Path(dirname).glob(f"*.{extension}"))
    flag = 0 if grayscale else 1
    return [cv2.imread(str(f), flag) for f in files], [f.stem for f in files]


def vector_angles(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Pairwise angles between row-vectors (reference :455-467)."""
    v1 = np.atleast_2d(v1)
    v2 = np.atleast_2d(v2)
    v1 = v1 / np.linalg.norm(v1, axis=-1, keepdims=True)
    v2 = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
    return np.arccos(np.clip(v1 @ v2.T, -1.0, 1.0))


# ----------------------- batch "picking" queries ---------------------------


def nearest_points(points: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Indices of the cloud points nearest to each query position — the
    batch replacement for the interactive picker (reference pick_points
    :470-485)."""
    from scipy.spatial import cKDTree

    return cKDTree(np.asarray(points)).query(np.atleast_2d(queries))[1]


def select_in_box(points: np.ndarray, box_min, box_max) -> np.ndarray:
    """Point indices inside an axis-aligned box — batch replacement for the
    ROI drag-select (reference :488-551)."""
    pts = np.asarray(points)
    m = np.all((pts >= np.asarray(box_min)) & (pts <= np.asarray(box_max)), axis=-1)
    return np.nonzero(m)[0]
