"""Fusion pipeline driver — reference Fusion3DSeg/process3D.py parity.

`process3DSeg(input_data_path, output_path, ...)` keeps the reference's
signature and artifact outputs (:14-68): locate the session (either the
reference's PointcloudMergeResults pickle cache or an rtabmap-export
directory), fuse + sparsify on TPU, occurrence-denoise, dump fusion_data.pkl
+ adj.pkl + ply, reload and return.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

from fusion3dseg_tpu.fusion import Fusion
from fusion3dseg_tpu.io import rtab
from fusion3dseg_tpu.utils import timing


def load_session(input_data_path, point_range=None) -> rtab.SessionData:
    """Locate session data: prefer the reference pickle cache
    (process3D.py:23-31 search), else an rtabmap-export directory."""
    input_data_path = Path(input_data_path)
    merge = input_data_path / "PointcloudMergeResults"
    if merge.is_dir():
        tofs = [f for f in os.listdir(merge) if "tofsegment" in f]
        if tofs:
            sub = tofs[0][:-4].split("_", 1)[1]
            return rtab.SessionData.from_cache(
                merge / f"tofsegment_{sub}.pkl", merge / f"rtscameradata_{sub}.pkl"
            )
    if (input_data_path / "depth").is_dir():
        return rtab.SessionData.from_export_dir(input_data_path)
    raise FileNotFoundError(f"no session data under {input_data_path}")


def process3DSeg(
    input_data_path,
    output_path,
    radius: float = 0.05,
    angle: float = 10.0,
    stride: int = 10,
    point_range: Tuple[float, float] = (0.1, 4.0),
    decimation: int = 1,
    min_occ: Optional[int] = 3,
    capacity: Optional[int] = 1 << 20,
    verbose: bool = False,
    session: Optional[rtab.SessionData] = None,
    apply_min_occ: bool = False,
    adjacency_degree: int = 32,
):
    """Fuse a session into a sparse cloud + artifacts.

    Returns (points, normals, colors, nmerges, occurences, nframes,
    depth_hw, adj) — the reference's return tuple (process3D.py:64-68).

    Note on min_occ: the reference computes the occurrence filter but dumps
    the UNFILTERED arrays (process3D.py:50-63 — the filtered `ds_pts_` is
    never used), keeping uv2pt indices consistent. Default reproduces that
    behavior; `apply_min_occ=True` actually applies the filter AND remaps
    every uv2pt artifact to the filtered indices (dropped points -> -1), so
    downstream voting sees the denoised cloud.

    capacity=None auto-sizes the sparse buffer from the seed frame's
    sparsification density.
    """
    import numpy as np

    if session is None:
        session = load_session(input_data_path)

    fuser = Fusion(
        session,
        point_range=point_range,
        decimation=decimation,
        capacity=capacity,
        save_lookups=True,
        out_dir=output_path,
    )
    with timing.span("fusion", verbose=verbose, frames=session.nframes):
        pts, norms, clrs, nmerges, occurences = fuser.fuse(
            radius, angle, stride, max_depth=point_range[1], skip=1, verbose=verbose
        )
    if verbose:
        print(
            f"total {fuser.npts * fuser.nframes} points from {fuser.nframes} "
            f"frames fused into {len(pts)} points"
        )

    if min_occ is not None:
        mask, _ = fuser.filter(nmerges, min_occ, None, less_than=False)
        if verbose:
            print(f"points passing nmerges >= {min_occ}: {mask.sum()}")
        if apply_min_occ:
            remap = np.full(len(pts) + 1, -1, np.int32)
            remap[:-1][mask] = np.arange(int(mask.sum()), dtype=np.int32)
            pts, norms, clrs = pts[mask], norms[mask], clrs[mask]
            nmerges, occurences = nmerges[mask], occurences[mask]
            uvdir = Path(output_path) / "fusion" / "uv2pt"
            for f in uvdir.glob("*.npy"):
                uv = np.load(f)
                np.save(f, remap[uv])  # uv == -1 indexes remap[-1] == -1

    with timing.span("fusion.dump", verbose=verbose):
        fuser.dump_data(output_path, pts, norms, clrs, nmerges, occurences, True,
                        verbose, adjacency_degree=adjacency_degree)
    return (*Fusion.load_data(output_path),)
