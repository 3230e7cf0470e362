"""Plane / project-format utilities + connected-graph integration.

Capability parity with reference segUtils/planeUtils.py: the category and
shape legends (:10-26), the VIDs CSV contract produced/consumed around the
external ConnectedGraph binary (:37-49, :82-91), ply path resolution
(:66-80), normals attachment (:93-99) and plane txt reading (:101-102).

The external binary is replaced by our native C++ library (native/
neighbor_graph.cpp): `run_connected` calls it in-process via ctypes (or the
CLI for drop-in script compatibility) and speaks the same VIDs CSV format.
Plane fitting uses least-squares/PCA (pipeline/door_window.fit_plane)
instead of skspatial.
"""

from __future__ import annotations

import os
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import numpy as np


def obj_legend() -> dict:
    """Category legend (reference ObjLegend :10-11)."""
    return {1: "Walls", 2: "Ceilings", 3: "Floors", 4: "Beams",
            5: "Columns", 6: "Doors", 7: "Windows", 8: "Pipes"}


def shape_legend() -> dict:
    """Shape legend (reference getShapelegend :13-14)."""
    return {"Plane": 1, "Cuboid": 2, "Cylinders": 3, "Sphere": 4,
            "Cone": 5, "Unidentified": 0}


def headers() -> dict:
    """Plane-table column headers (reference Headers :16-18)."""
    return {"Shapeinfo": 0, "indicies": 1, "BBoxids": 2, "BBoxpoints": 3,
            "Hide": 4, "Category": 5, "Shape": 6, "Area": 7}


def reveal_shape(category: int) -> int:
    """Category -> shape id (reference revealShape :20-26)."""
    if category in range(1, 8) and category not in (4, 5):
        return shape_legend()["Plane"]
    if category in (4, 5):
        return shape_legend()["Cuboid"]
    return shape_legend()["Cylinders"]


def col(name: str) -> int:
    return headers()[name]


def obj(name: str) -> Optional[int]:
    for key, val in obj_legend().items():
        if val == name:
            return key
    return None


def run_connected(points, radius: float, labels=None) -> List[np.ndarray]:
    """Connected-vertex groups over the radius graph — the ConnectedGraph
    capability (reference run_connected_executable :37-49) as an in-process
    native call. Returns a list of per-component vertex-index arrays (the
    VIDs rows)."""
    from fusion3dseg_tpu.io import native

    comp = native.connected_components(np.asarray(points, np.float32), radius, labels)
    groups = {}
    for i, c in enumerate(comp):
        groups.setdefault(int(c), []).append(i)
    return [np.asarray(v, np.int64) for v in groups.values()]


def write_vids_csv(path, groups) -> None:
    """Write the VIDs CSV the reference parses (planeUtils.py:82-91)."""
    with open(path, "w") as fp:
        fp.write("VIDs\n")
        for g in groups:
            fp.write(",".join([str(len(g))] + [str(int(i)) for i in g]) + "\n")


def read_vids_csv(path) -> List[List[int]]:
    """Parse a VIDs CSV -> list of vertex-index lists (reference
    ReadVerticesConnectedFiles :82-91: first field is the count, dropped)."""
    out = []
    with open(path) as fp:
        header = fp.readline()
        assert header.strip().startswith("VIDs")
        for line in fp:
            line = line.strip()
            if not line:
                continue
            fields = line.split(",")
            out.append([int(x) for x in fields[1:]])
    return out


def read_vertices_connected_files(file_connected_path, file_vertex_path):
    """Reference ReadVerticesConnectedFiles contract (:82-91): returns
    (vertex array rounded to 3 decimals with [x,y,z,...,id,1] columns,
    list of vertex-index lists)."""
    import pandas as pd

    vertex_all = pd.read_csv(file_vertex_path, sep=",").values
    vertex_all = np.column_stack(
        (vertex_all[:, 1:], vertex_all[:, 0], np.ones(len(vertex_all)))
    )
    return vertex_all.round(3), read_vids_csv(file_connected_path)


def add_normals_from_cloud(vertex: np.ndarray, points: np.ndarray, normals: np.ndarray):
    """Attach per-point normals as extra columns (reference
    AddNormalfromCloud :93-99)."""
    if len(normals) != len(vertex):
        raise IndexError
    return np.hstack((vertex, np.asarray(normals)))


def resolve_ply(input_path, folder: str = "fusion") -> str:
    """Locate the stage ply inside a session directory (reference
    ReadPlyFile :66-80 naming conventions)."""
    prefix = {"fusion": "fusion_", "segmentation": "cleaned"}.get(folder, "Img_")
    folder_path = Path(input_path) / folder
    cands = sorted(p for p in folder_path.glob("*.ply") if prefix in p.name)
    if not cands:
        cands = sorted(p for p in Path(input_path).glob("*.ply") if "Img_" in p.name)
    if not cands:
        raise FileNotFoundError(f"no {prefix}*.ply under {folder_path}")
    return str(cands[0])


def read_plane_txt(inputfile) -> np.ndarray:
    """(reference Planetxtread :101-102)."""
    return np.loadtxt(inputfile)


def path_correction(p: str) -> str:
    return p.replace("\\", "/")


def exists(filepath) -> bool:
    return os.path.exists(filepath)


def check_folder_status(folderpath):
    os.makedirs(folderpath, exist_ok=True)
    return folderpath


def current_time(fmt: str = "%Y%m%d_%H-%M") -> str:
    return datetime.now().strftime(fmt)
