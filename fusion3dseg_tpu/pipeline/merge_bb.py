"""Intersecting-OBB instance merging — reference merge_intersecting_bb.py parity.

merge_bb(dir_name, info_sem, id_info_per_point, points) keeps the reference's
entry signature (:103) and artifact outputs
(panoptic_segmentation/{final_info.json, ids.npy}, :134-137), with the
criterion intact: two instances merge when they share the same parent and
some cloud point lies inside both oriented boxes (:68-91).

Re-design (SURVEY.md §7.5): all K OBBs + the full [K,K] co-membership matrix
come from one batched device program (ops/obb.py — PCA boxes, [K,N]@[N,K]
MXU matmul) and the merge itself is a host union-find, replacing the O(K^2)
per-pair open3d loop and fixing its del-while-indexing bug (:113-120).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import List

import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.io import artifacts
from fusion3dseg_tpu.ops import obb as obb_ops


# backend="auto" crossover (shared with master_classes): see
# ops/obb.py HOST_OBB_MAX_KN
_HOST_OBB_MAX_KN = obb_ops.HOST_OBB_MAX_KN


def merge_bb(dir_name, info_sem: List[dict], id_info_per_point, pcd_points,
             verbose: bool = True, points_dev=None, backend: str = "auto"):
    """Merge same-parent instances with intersecting OBBs.

    Args:
      dir_name: session directory (writes panoptic_segmentation/).
      info_sem: per-instance info dicts with 'id', 'parent_id', 'area'
        (the final_info produced by master_classes).
      id_info_per_point: [N] per-point instance ids.
      pcd_points: [N, 3] cloud points (array or an object with .points).
      points_dev: optional device-resident [N, 3] copy of the same points;
        passing it skips two host->device uploads (the remote-device
        tunnel moves ~20-40 MB/s, so re-uploading a 100k cloud twice costs
        ~0.1-0.2 s of the e2e budget). Only consulted by the device backend.
      backend: "auto" | "host" | "device" for the OBB + intersection
        compute. The points are already host-resident here, so at pipeline
        scale (K*N < _HOST_OBB_MAX_KN) "auto" runs the whole thing in
        NumPy and never touches the device (VERDICT r3 #3: each device
        round-trip costs 30-90 ms through the tunnel).

    Returns (info_sem, id_info_per_point) after merging.
    """
    points = np.asarray(getattr(pcd_points, "points", pcd_points), np.float32)
    ids = np.asarray(id_info_per_point).copy()
    len_before = len(info_sem)
    t0 = time.perf_counter()

    if len(info_sem) == 0 or len(points) == 0:
        _dump(dir_name, info_sem, ids)
        return info_sem, ids

    # dense reindex of the instances listed in info_sem
    inst_ids = np.asarray([int(i["id"]) for i in info_sem])
    K = len(inst_ids)
    lut = np.full(int(max(ids.max(), inst_ids.max())) + 2, -1, np.int32)
    lut[inst_ids] = np.arange(K, dtype=np.int32)
    dense = lut[ids]  # [N] dense instance index or -1

    if backend not in ("auto", "host", "device"):
        raise ValueError(f"unknown merge_bb backend {backend!r}")
    use_host = backend == "host" or (
        backend == "auto" and K * len(points) <= _HOST_OBB_MAX_KN
    )
    if use_host:
        intersect, centers, axes, half, cnts = (
            obb_ops.obb_intersection_matrix_np(points, dense, K)
        )
    else:
        pts_d = points_dev if points_dev is not None else jnp.asarray(points)
        intersect, centers, axes, half, cnts = obb_ops.obb_intersection_matrix(
            pts_d, jnp.asarray(dense), K
        )
        intersect = np.asarray(intersect)
        centers, axes, half, cnts = (
            np.asarray(centers), np.asarray(axes), np.asarray(half),
            np.asarray(cnts),
        )

    parents = np.asarray(
        [i.get("parent_id") if i.get("parent_id") is not None else -1 for i in info_sem]
    )
    # the reference never merges the background/semantic id 0 entry (:113)
    mergeable = np.ones(K, bool)
    if K:
        mergeable[0] = False
    root = obb_ops.merge_intersecting_instances(intersect, parents, mergeable)

    # rewrite ids + accumulate areas into the root instances (:58-62)
    new_info = []
    kept_orig = []  # original dense index of each kept instance
    changed = set()  # roots that absorbed at least one instance
    for k, info in enumerate(info_sem):
        if root[k] == k:
            new_info.append(info)
            kept_orig.append(k)
        else:
            r = int(root[k])
            info_sem[r]["area"] = int(info_sem[r]["area"]) + int(info["area"])
            ids[ids == inst_ids[k]] = inst_ids[r]
            changed.add(r)

    # re-derive OBBs (:122-128) on HOST: unmerged boxes are unchanged from
    # the device program above; only roots that absorbed points get a fresh
    # PCA box over their (small) member set — no second device dispatch.
    for k, info in enumerate(new_info):
        if k == 0:
            continue  # reference skips entry 0 (:122)
        ko = kept_orig[k]
        if ko in changed:
            members = points[ids == inst_ids[ko]]
            if len(members) > 4:
                info["bbox"] = obb_ops.obb_corners_np(
                    *obb_ops.pca_obb_np(members)
                ).tolist()
        elif cnts[ko] > 4:
            info["bbox"] = obb_ops.obb_corners_np(
                centers[ko], axes[ko], half[ko]
            ).tolist()

    dt = time.perf_counter() - t0
    if verbose:
        # the reference's runtime telemetry (merge_intersecting_bb.py:130-131)
        print(
            f"Time taken for merging {len_before} to {len(new_info)} "
            f"Bounding boxes = {dt} seconds"
        )
    _dump(dir_name, new_info, ids)
    return new_info, ids


def _dump(dir_name, info, ids):
    out = Path(dir_name) / "panoptic_segmentation"
    out.mkdir(parents=True, exist_ok=True)
    artifacts.write_info_json(out / "final_info.json", info)
    np.save(out / "ids.npy", ids)
