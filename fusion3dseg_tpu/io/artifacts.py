"""Stage-artifact readers/writers — the pipeline's de-facto public API.

The reference's stages communicate exclusively via files on disk with fixed
names and dtypes (SURVEY.md §1 artifact table). These contracts are preserved
byte-compatibly where formats allow:

  fusion/fusion_data.pkl   dict(points, normals, colors, nmerges, occurences,
                                nframes, depth_hw)          (fusion.py:349-368)
  fusion/adj.pkl           object ndarray of neighbor index arrays
                                                            (fusion.py:369-377)
  fusion/uv2pt/<frame>.npy [H*W] int32, -1 = unmapped       (fusion.py:326-327)
  segmentation/votes.npy   [N, nclasses+1]                  (voting.py:100-102)
  segmentation/classes.npy [N] int                          (get3DSeg.py:228)
  segmentation/info.json   per-class dicts                  (get3DSeg.py:277-285)
  panoptic_segmentation/{ids.npy, info.json}                (get3DSeg.py:311,339)
  *.ply point clouds via io/ply.py (open3d replaced)
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from fusion3dseg_tpu.io import ply


def dump_fusion_data(
    dirname,
    points: np.ndarray,
    normals: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    nmerges: Optional[np.ndarray] = None,
    occurences: Optional[np.ndarray] = None,
    nframes: int = 0,
    depth_hw: Tuple[int, int] = (0, 0),
    adjacency: Optional[np.ndarray] = None,
    ds_radius: Optional[float] = None,
    ds_angle: Optional[float] = None,
) -> None:
    """Write fusion_data.pkl (+ adj.pkl, + fusion_{r}_{a}.ply)."""
    dirname = Path(dirname)
    (dirname / "fusion").mkdir(parents=True, exist_ok=True)
    data = {
        "points": np.asarray(points),
        "normals": None if normals is None else np.asarray(normals),
        "colors": None if colors is None else np.asarray(colors),
        "nmerges": None if nmerges is None else np.asarray(nmerges),
        "occurences": None if occurences is None else np.asarray(occurences),
        "nframes": nframes,
        "depth_hw": tuple(depth_hw),
    }
    with open(dirname / "fusion" / "fusion_data.pkl", "wb") as fp:
        pickle.dump(data, fp)
    if adjacency is not None:
        with open(dirname / "fusion" / "adj.pkl", "wb") as fp:
            pickle.dump(adjacency, fp)
    radius = str(ds_radius).replace(".", "_")
    ply.write_point_cloud(
        dirname / "fusion" / f"fusion_{radius}_{ds_angle}.ply",
        points, colors=colors, normals=normals,
    )


def load_fusion_data(dirname):
    """Read fusion_data.pkl + adj.pkl; same return tuple as the reference's
    Fusion.load_data (fusion.py:389-407)."""
    dirname = Path(dirname)
    with open(dirname / "fusion" / "fusion_data.pkl", "rb") as fp:
        data = pickle.load(fp)
    adjfile = dirname / "fusion" / "adj.pkl"
    adj = None
    if adjfile.is_file():
        with open(adjfile, "rb") as fp:
            adj = pickle.load(fp)
    return (
        data["points"], data["normals"], data["colors"],
        data["nmerges"], data["occurences"],
        data["nframes"], data["depth_hw"], adj,
    )


def save_uv2pt(dirname, frame_name: str, uv2pt: np.ndarray) -> None:
    out = Path(dirname) / "fusion" / "uv2pt"
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / f"{frame_name}.npy", np.asarray(uv2pt, np.int32))


def save_uv2pt_batch(dirname, frame_names, uv2pt_batch) -> None:
    out = Path(dirname) / "fusion" / "uv2pt"
    out.mkdir(parents=True, exist_ok=True)
    # this writer emits the WHOLE session: clear stale files from any
    # previous run first (a different frame set / larger cloud would
    # otherwise leave rows that index past the new cloud, and
    # apply_min_occ / vote_session consume every *.npy in the directory)
    for stale in out.glob("*.npy"):
        stale.unlink()
    uv2pt_batch = np.asarray(uv2pt_batch, np.int32)
    for name, uv in zip(frame_names, uv2pt_batch):
        np.save(out / f"{name}.npy", uv)


def matched_mask_uv2pt_files(maskdir, uv2ptdir):
    """Pair mask and uv2pt files by stem intersection (voting.py:42-54)."""
    maskdir, uv2ptdir = Path(maskdir), Path(uv2ptdir)
    masks = {p.stem: p for p in maskdir.iterdir() if p.is_file()}
    uvs = {p.stem: p for p in uv2ptdir.iterdir() if p.is_file()}
    names = sorted(masks.keys() & uvs.keys())
    return [masks[n] for n in names], [uvs[n] for n in names]


def write_info_json(path, info) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    def clean(o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        return o

    with open(path, "w") as fp:
        json.dump(clean(info), fp, indent=4)


def read_info_json(path):
    with open(path) as fp:
        return json.load(fp)
