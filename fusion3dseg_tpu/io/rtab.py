"""RTAB-Map exported-session ingestion (host loader -> device-resident arrays).

Capability parity with reference RTAB_utils/ (SURVEY.md §2.2-2.6): reads the
directory produced by `rtabmap-export --images --poses_format 11 --ba
--poses_camera --images_id` (calibration YAML, RGBD-SLAM pose txt, rgb jpg,
depth png) and produces per-frame world point clouds with camera-facing
normals and colors.

Re-design: the reference back-projects and pose-transforms frame-by-frame in
Python (ios_rtab.py:155-192) and estimates normals with an open3d KD-tree per
frame (ios_rtab.py:236-248). Here the whole session is loaded into [F, H*W]
arrays and back-projection + world transform + normal estimation run as ONE
jitted, vmapped program on device. Normals come from depth-image gradient
cross products (the structured-grid equivalent of local plane fitting) and
are sign-flipped toward the camera eye, preserving the reference's
orientation convention (ios_rtab.py:246-247).

The pickle cache layout of saveRTABSegments (tofcameradata_segments_*.pkl,
tofsegment_*.pkl, rtscameradata_*.pkl) is supported for compatibility both
ways (write_cache / SessionData.from_cache).
"""

from __future__ import annotations

import os
import pickle
import shutil
import subprocess
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from fusion3dseg_tpu.geometry import camera, quaternion as quat


def read_calibration(path) -> np.ndarray:
    """Read the RTAB camera YAML -> [3,3] intrinsics.

    The file carries a '%YAML:1.0' directive line OpenCV-style that PyYAML
    rejects; the reference skips the first two lines (ios_rtab.py:24-27).
    """
    with open(path) as fp:
        for _ in range(2):
            fp.readline()
        data = yaml.safe_load(fp)
    return np.reshape(np.asarray(data["camera_matrix"]["data"], np.float64), (3, 3))


def read_poses(pose_file, startf: int = 0, stopf: Optional[int] = None):
    """Parse RGBD-SLAM + ID format poses (ios_rtab.py:49-68).

    Columns: [timestamp, x, y, z, qx, qy, qz, qw, image_id].

    Returns (img_idx [F], xyz [F,3], quat_xyzw [F,4], timestamps [F]).
    """
    pose = np.genfromtxt(pose_file, delimiter=" ")
    pose = np.atleast_2d(pose)[startf:stopf]
    return (
        pose[:, 8].astype(np.int64),
        pose[:, 1:4],
        pose[:, 4:8],
        pose[:, 0],
    )


def scale_intrinsics(K: np.ndarray, scale_x: float, scale_y: float) -> np.ndarray:
    """Scale K from RGB to depth resolution (ios_rtab.py:115-131)."""
    return np.array(
        [
            [K[0, 0] * scale_x, 0.0, K[0, 2] * scale_x],
            [0.0, K[1, 1] * scale_y, K[1, 2] * scale_y],
            [0.0, 0.0, 1.0],
        ]
    )


@partial(jax.jit, static_argnames=())
def _normals_from_grid(points_cam: jax.Array) -> jax.Array:
    """Camera-facing unit normals from an organized [H, W, 3] point image.

    Central differences along the pixel grid, n = du x dv, normalized, then
    flipped so normals point toward the camera eye (origin in camera frame) —
    the reference's flip rule (ios_rtab.py:243-247). Borders use one-sided
    differences via edge-replicate padding: a plain roll would difference
    against the OPPOSITE image edge (geometrically unrelated points), and
    the garbage border normals then spuriously fail the fusion engine's
    normal-cone gate along the 1-px frame boundary.
    """
    p = jnp.pad(points_cam, ((1, 1), (1, 1), (0, 0)), mode="edge")
    du = p[1:-1, 2:] - p[1:-1, :-2]
    dv = p[2:, 1:-1] - p[:-2, 1:-1]
    n = jnp.cross(du, dv)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    toward_eye = jnp.sum(n * points_cam, axis=-1, keepdims=True) > 0
    return jnp.where(toward_eye, -n, n)


@partial(jax.jit, static_argnames=("height", "width"))
def frames_to_world(
    depth_m: jax.Array,  # [F, H, W] meters
    Ks: jax.Array,  # [3, 3] depth-scaled intrinsics
    quats_wxyz: jax.Array,  # [F, 4]
    translations: jax.Array,  # [F, 3]
    height: int,
    width: int,
):
    """Whole-session back-projection: depth images -> world clouds + normals.

    Returns (world_points [F, H*W, 3], world_normals [F, H*W, 3],
    cam_depth [F, H*W]).
    """

    def one(depth, q, t):
        pts_cam = camera.backproject_depth(depth, Ks)  # [H*W, 3]
        normals_cam = _normals_from_grid(pts_cam.reshape(height, width, 3)).reshape(-1, 3)
        pts_w = camera.camera_to_world(pts_cam, q, t)
        nrm_w = quat.rotate(q, normals_cam)
        return pts_w, nrm_w, pts_cam[:, 2]

    return jax.vmap(one)(depth_m, quats_wxyz, translations)


@dataclass
class SessionData:
    """Device-friendly whole-session arrays (the L1 output of SURVEY.md §1)."""

    frame_numbers: np.ndarray  # [F] int
    K: np.ndarray  # [3,3] RGB-resolution intrinsics
    Ks: np.ndarray  # [3,3] depth-scaled intrinsics
    quats_wxyz: np.ndarray  # [F,4]
    translations: np.ndarray  # [F,3]
    rgb_hw: Tuple[int, int]
    depth_hw: Tuple[int, int]
    points: np.ndarray  # [F, H*W, 3] world points
    normals: np.ndarray  # [F, H*W, 3] world normals
    colors: np.ndarray  # [F, H*W, 3] float [0,1]
    depth: np.ndarray  # [F, H*W] camera-frame depth (m)

    @property
    def nframes(self) -> int:
        return len(self.frame_numbers)

    @classmethod
    def from_export_dir(
        cls,
        data_path,
        rgb_dir=None,
        depth_dir=None,
        pose_file=None,
        calib_file=None,
        startf: int = 0,
        stopf: Optional[int] = None,
        stepf: int = 1,
        padding: bool = False,
    ) -> "SessionData":
        """Load an rtabmap-export directory (jpg rgb + 16-bit png depth in mm).

        padding=True zeroes a 10 px depth border (ios_rtab.py:104-109).
        """
        import cv2

        data_path = Path(data_path)
        rgb_dir = Path(rgb_dir or data_path / "rgb")
        depth_dir = Path(depth_dir or data_path / "depth")
        pose_file = pose_file or data_path / "poses.txt"
        calib = None
        if calib_file is not None:
            calib = read_calibration(calib_file)
        else:
            for cand in (data_path / "calibration.yaml", data_path / "calib" ):
                if Path(cand).is_file():
                    calib = read_calibration(cand)
                    break
            if calib is None:
                caldir = data_path / "calib"
                if caldir.is_dir():
                    calib = read_calibration(sorted(caldir.iterdir())[0])
        if calib is None:
            # fall back to the packaged default (the reference's shipped
            # intrinsics, RTAB_utils/calibration.yaml)
            calib = read_calibration(Path(__file__).parent / "default_calibration.yaml")

        img_idx, xyz, xyzw, _ = read_poses(pose_file, startf, stopf)
        img_idx, xyz, xyzw = img_idx[::stepf], xyz[::stepf], xyzw[::stepf]

        rgbs, depths, keep = [], [], []
        for k, i in enumerate(img_idx):
            rgb = cv2.imread(str(rgb_dir / f"{int(i)}.jpg"))
            d = cv2.imread(str(depth_dir / f"{int(i)}.png"), cv2.IMREAD_UNCHANGED)
            if rgb is None or d is None:
                # real exports drop frames (io/tum.py guards the same way);
                # skip the frame AND its pose rather than crash ingestion
                print(f"warning: skipping frame {int(i)} — unreadable "
                      f"rgb/depth image")
                continue
            rgbs.append(rgb[:, :, ::-1])
            depths.append(d)
            keep.append(k)
        if len(keep) != len(img_idx):
            img_idx = img_idx[keep]
            xyz, xyzw = xyz[keep], xyzw[keep]
        if not rgbs:
            raise FileNotFoundError(
                f"no readable rgb/depth frame pairs under {data_path} for "
                f"the selected pose range — is this an rtabmap export dir?"
            )
        rgbs = np.stack(rgbs)
        depths = np.stack(depths).astype(np.float32)
        if padding:
            depths[:, :10], depths[:, -10:] = 0, 0
            depths[:, :, :10], depths[:, :, -10:] = 0, 0

        return cls.from_arrays(rgbs, depths / 1000.0, calib, xyzw, xyz, img_idx)

    @classmethod
    def from_arrays(
        cls,
        rgbs: np.ndarray,  # [F, Hr, Wr, 3] uint8
        depth_m: np.ndarray,  # [F, H, W] meters
        K_rgb: np.ndarray,
        quats_xyzw: np.ndarray,
        translations: np.ndarray,
        frame_numbers: Optional[np.ndarray] = None,
    ) -> "SessionData":
        import cv2

        F, H, W = depth_m.shape
        Hr, Wr = rgbs.shape[1:3]
        Ks = scale_intrinsics(K_rgb, W / Wr, H / Hr)
        wxyz = np.asarray(quats_xyzw)[:, [3, 0, 1, 2]]
        if frame_numbers is None:
            frame_numbers = np.arange(F)

        pts, nrm, depth = frames_to_world(
            jnp.asarray(depth_m, jnp.float32),
            jnp.asarray(Ks, jnp.float32),
            jnp.asarray(wxyz, jnp.float32),
            jnp.asarray(translations, jnp.float32),
            H, W,
        )
        colors = np.stack(
            [cv2.resize(r, (W, H), interpolation=cv2.INTER_AREA) for r in rgbs]
        ).astype(np.float32).reshape(F, H * W, 3) / 255.0

        return cls(
            frame_numbers=np.asarray(frame_numbers),
            K=np.asarray(K_rgb),
            Ks=Ks,
            quats_wxyz=wxyz.astype(np.float32),
            translations=np.asarray(translations, np.float32),
            rgb_hw=(Hr, Wr),
            depth_hw=(H, W),
            points=np.asarray(pts),
            normals=np.asarray(nrm),
            colors=colors,
            depth=np.asarray(depth),
        )

    # ---------------- reference pickle-cache compatibility ----------------

    def write_cache(self, data_path) -> str:
        """Write the reference's PointcloudMergeResults pickle layout
        (saveRTABSegments.py:8-46): per-frame tofcameradata_segments pickles,
        a tofsegment index, and the rtscameradata camera pickle."""
        data_path = Path(data_path)
        F = self.nframes
        sub = f"0_{F}_1"
        segdir = data_path / "PointcloudMergeResults" / f"Segments_{sub}"
        segdir.mkdir(parents=True, exist_ok=True)

        cam_pts = np.asarray(
            quat.rotate_inverse(
                jnp.asarray(self.quats_wxyz),
                jnp.asarray(self.points - self.translations[:, None, :]),
            )
        )
        index = []
        for i in range(F):
            frame = {
                "frameNumber": int(self.frame_numbers[i]),
                # the reference caches orgPoints already rescaled to meters
                # (ios_rtab.py:185 divides by 1000 BEFORE getTofCameraData
                # stores them)
                "orgPoints": cam_pts[i],
                "orgNormals": self.translations[i] - cam_pts[i],
                "modPoints": self.points[i],
                "modNormals": self.translations[i] - self.points[i],
                "orgColorPoints": self.colors[i],
                "modSurfaceNormals": self.normals[i],
            }
            rel = os.path.join(
                "PointcloudMergeResults", f"Segments_{sub}",
                f"tofcameradata_segments_{sub}_{i}.pkl",
            )
            with open(data_path / rel, "wb") as fp:
                pickle.dump(frame, fp)
            index.append({"frameNumber": frame["frameNumber"], "fileName": rel})

        with open(data_path / "PointcloudMergeResults" / f"tofsegment_{sub}.pkl", "wb") as fp:
            pickle.dump(index, fp)
        rts = {
            "intrinsic": self.K,
            "intrinsicScaled": self.Ks,
            "odo_wxyz": self.quats_wxyz[:, [1, 2, 3, 0]],  # stored as xyzw
            "odo_xyz": self.translations,
            "RGB_res": (*self.rgb_hw, 3),
            "Depth_res": self.depth_hw,
        }
        with open(data_path / "PointcloudMergeResults" / f"rtscameradata_{sub}.pkl", "wb") as fp:
            pickle.dump(rts, fp)
        return sub

    @classmethod
    def from_cache(cls, tof_index_file, rts_file) -> "SessionData":
        """Load the reference pickle cache (fusion.py:17-77 input contract)."""
        tof_index_file = str(tof_index_file)
        dirname = Path(tof_index_file.split("PointcloudMergeResults")[0])
        with open(tof_index_file, "rb") as fp:
            index = pickle.load(fp)
        with open(rts_file, "rb") as fp:
            rts = pickle.load(fp)

        pts, nrms, clrs, depth, fnums = [], [], [], [], []
        for entry in index:
            with open(dirname / entry["fileName"].strip(), "rb") as fp:
                fr = pickle.load(fp)
            fnums.append(int(fr["frameNumber"]))
            pts.append(np.asarray(fr["modPoints"], np.float32))
            nrms.append(np.asarray(fr["modSurfaceNormals"], np.float32))
            clrs.append(np.asarray(fr["orgColorPoints"], np.float32))
            # orgPoints are cached in meters (see write_cache note)
            depth.append(np.asarray(fr["orgPoints"], np.float32)[:, 2])
        H, W = rts["Depth_res"][:2]
        xyzw = np.asarray(rts["odo_wxyz"], np.float32)
        return cls(
            frame_numbers=np.asarray(fnums),
            K=np.asarray(rts["intrinsic"]),
            Ks=np.asarray(rts["intrinsicScaled"]),
            quats_wxyz=xyzw[:, [3, 0, 1, 2]],
            translations=np.asarray(rts["odo_xyz"], np.float32),
            rgb_hw=tuple(rts["RGB_res"][:2]),
            depth_hw=(H, W),
            points=np.stack(pts),
            normals=np.stack(nrms),
            colors=np.stack(clrs),
            depth=np.stack(depth),
        )


def perturb_poses(
    quats_xyzw: np.ndarray,
    translations: np.ndarray,
    rotation_xyzw,
    translation_delta,
    frame_indices,
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply a rotation/translation perturbation to a subset of frames.

    Capability parity with reference getModifiedYRTS (ios_rtab.py:310-326):
    compose the given quaternion onto each selected frame's rotation and add
    the translation delta. Returns new (quats_xyzw, translations) arrays.
    """
    quats_xyzw = np.array(quats_xyzw, copy=True)
    translations = np.array(translations, copy=True)
    idx = np.asarray(list(frame_indices), np.int64)
    if len(idx) == 0:
        return quats_xyzw, translations
    dq = np.asarray(rotation_xyzw, np.float64)[[3, 0, 1, 2]]  # -> wxyz
    # one batched Hamilton product on the host — the previous per-frame
    # jnp calls paid a 30-90 ms device dispatch PER FRAME (review r3)
    q = quats_xyzw[idx][:, [3, 0, 1, 2]].astype(np.float64)
    w1, x1, y1, z1 = dq
    w2, x2, y2, z2 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    composed = np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=1)
    quats_xyzw[idx] = composed[:, [1, 2, 3, 0]]
    translations[idx] = translations[idx] + np.asarray(translation_delta)
    return quats_xyzw, translations


def retransform_points(
    org_points_cam: np.ndarray,  # [F, N, 3] camera-frame points
    quats_xyzw: np.ndarray,
    translations: np.ndarray,
) -> np.ndarray:
    """Re-derive world points under (modified) poses in one vmapped program.

    Capability parity with reference getModifytofCameraData
    (ios_rtab.py:328-352), which loops frames through pyquaternion.
    """
    wxyz = np.asarray(quats_xyzw)[:, [3, 0, 1, 2]]
    return np.asarray(
        camera.camera_to_world(
            jnp.asarray(org_points_cam, jnp.float32),
            jnp.asarray(wxyz, jnp.float32),
            jnp.asarray(translations, jnp.float32),
        )
    )


def export_rtab(path_in, path_out) -> bool:
    """Shell out to the external rtabmap-export C++ tool (extRTAB.py:7-49).

    Host-side ingestion only; the pipeline proper consumes the exported
    directory (SURVEY.md §2.20 build note). Returns False when the tool is
    not installed.
    """
    if shutil.which("rtabmap-export") is None:
        print("rtabmap-export not found on PATH; provide an exported directory instead")
        return False
    if not os.path.exists(path_in):
        print(f"Error: '{path_in}' does not exist")
        return False
    if os.path.exists(path_out):
        shutil.rmtree(path_out)
    os.makedirs(path_out)
    cmd = [
        "rtabmap-export", "--images", "--poses_format", "11", "--ba",
        "--poses_camera", "--images_id", "--output_dir", str(path_out), str(path_in),
    ]
    result = subprocess.run(cmd, capture_output=True, text=True)
    return result.returncode == 0
