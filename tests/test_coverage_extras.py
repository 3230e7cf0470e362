"""Coverage for the remaining small public surfaces: pose perturbation,
correspondence viz writers, mesh texture utils, planes csv interop."""

import numpy as np
import jax.numpy as jnp
import pytest

from fusion3dseg_tpu.geometry import quaternion as quat
from fusion3dseg_tpu.io import rtab, ply
from fusion3dseg_tpu.pipeline import correspondence, planes
from fusion3dseg_tpu.utils import mesh as meshu


class TestPosePerturbation:
    def test_identity_perturbation_is_noop(self, rng):
        quats = rng.normal(size=(4, 4))
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        trans = rng.normal(size=(4, 3))
        q2, t2 = rtab.perturb_poses(
            quats, trans, rotation_xyzw=[0, 0, 0, 1], translation_delta=[0, 0, 0],
            frame_indices=[1, 2],
        )
        np.testing.assert_allclose(q2, quats, atol=1e-6)
        np.testing.assert_allclose(t2, trans, atol=1e-12)

    def test_rotation_composes(self, rng):
        # 90 deg about z applied to the identity pose
        s = np.sin(np.pi / 4)
        quats = np.tile([0.0, 0, 0, 1.0], (2, 1))  # xyzw identity
        trans = np.zeros((2, 3))
        q2, t2 = rtab.perturb_poses(
            quats, trans, rotation_xyzw=[0, 0, s, np.cos(np.pi / 4)],
            translation_delta=[1, 0, 0], frame_indices=[0],
        )
        # frame 0 rotated: rotating [1,0,0] by the new pose gives [0,1,0]
        w = q2[0][[3, 0, 1, 2]]
        out = np.asarray(quat.rotate(jnp.asarray(w), jnp.asarray([[1.0, 0, 0]])))
        np.testing.assert_allclose(out[0], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(t2[0], [1, 0, 0])
        np.testing.assert_allclose(q2[1], quats[1])  # untouched frame

    def test_retransform_matches_camera_to_world(self, rng):
        quats = rng.normal(size=(3, 4))
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        trans = rng.normal(size=(3, 3)).astype(np.float32)
        pts_cam = rng.normal(size=(3, 50, 3)).astype(np.float32)
        world = rtab.retransform_points(pts_cam, quats, trans)
        for f in range(3):
            w = quats[f][[3, 0, 1, 2]]
            want = np.asarray(
                quat.rotate(jnp.asarray(w, jnp.float32), jnp.asarray(pts_cam[f]))
            ) + trans[f]
            np.testing.assert_allclose(world[f], want, atol=1e-5)


class TestCorrespondenceViz:
    def test_viz_proj_writes_pngs(self, tmp_path, rng):
        images = (rng.random((2, 8, 10, 3)) * 255).astype(np.uint8)
        ids = np.array([0, 1, 1])
        coords = np.array([[2, 3], [4, 5], [1, 1]])
        correspondence.Correspondence.viz_proj(ids, coords, images, outdir=tmp_path)
        import cv2

        img0 = cv2.imread(str(tmp_path / "1.png"))
        assert img0 is not None
        np.testing.assert_array_equal(img0[3, 2], [0, 0, 255])

    def test_viz_reproj_recolors_and_saves(self, tmp_path, rng):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        colors = np.zeros((20, 3))
        out = correspondence.Correspondence.viz_reproj(
            pts, colors, [3, 7], clr=(1, 0, 0), save=tmp_path / "r.ply"
        )
        np.testing.assert_array_equal(out[3], [1, 0, 0])
        np.testing.assert_array_equal(out[0], [0, 0, 0])
        p2, c2, _ = ply.read_point_cloud(tmp_path / "r.ply")
        assert c2[7][0] > 0.99


class TestMeshTextures:
    def test_uv_texture_sampling(self):
        tex = np.zeros((4, 4, 3), np.uint8)
        tex[0, 3] = [255, 0, 0]  # top-right in image coords
        uvs = np.array([[1.0, 1.0]])  # uv origin bottom-left -> top-right pixel
        cols = meshu.uv_texture_to_vertex_colors(uvs, tex)
        np.testing.assert_allclose(cols[0], [1, 0, 0])

    def test_rasterize_triangles(self):
        uvs = np.array([[0, 0], [1, 0], [0, 1]], float)
        tris = np.array([[0, 1, 2]])
        tex = meshu.rasterize_triangles_uv(uvs, tris, [[0, 255, 0]], (16, 16))
        assert (tex[..., 1] == 255).any()

    def test_triangle_colors_by_class(self):
        tris = np.array([[0, 1, 2], [2, 3, 4]])
        vc = np.array([5, 5, 7, 7, 7])
        palette = np.eye(8)
        colors, maj = meshu.triangle_colors_by_class(tris, vc, palette)
        assert maj[0] == 5 and maj[1] == 7

    def test_vector_angles(self):
        a = meshu.vector_angles([1, 0, 0], [0, 1, 0])
        np.testing.assert_allclose(a[0, 0], np.pi / 2, atol=1e-7)


class TestPlanesInterop:
    def test_read_vertices_connected_files(self, tmp_path, rng):
        import pandas as pd

        pts = rng.normal(size=(10, 3))
        df = pd.DataFrame(
            {"id": np.arange(10), "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}
        )
        df.to_csv(tmp_path / "verts.csv", index=False)
        planes.write_vids_csv(tmp_path / "vids.csv", [np.arange(5), np.arange(5, 10)])
        verts, lists = planes.read_vertices_connected_files(
            tmp_path / "vids.csv", tmp_path / "verts.csv"
        )
        assert verts.shape == (10, 5)  # xyz + id + ones
        assert [len(l) for l in lists] == [5, 5]

    def test_add_normals(self, rng):
        v = rng.normal(size=(5, 4))
        n = rng.normal(size=(5, 3))
        out = planes.add_normals_from_cloud(v, None, n)
        assert out.shape == (5, 7)
        with pytest.raises(IndexError):
            planes.add_normals_from_cloud(v, None, n[:3])

    def test_resolve_ply(self, tmp_path):
        (tmp_path / "fusion").mkdir()
        ply.write_point_cloud(tmp_path / "fusion" / "fusion_0_05_10.ply",
                              np.zeros((3, 3), np.float32))
        got = planes.resolve_ply(tmp_path, "fusion")
        assert got.endswith("fusion_0_05_10.ply")


class TestCameraJson:
    def test_read_pinhole_params(self, tmp_path):
        import json

        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        data = {
            "intrinsic": {
                "intrinsic_matrix": K.flatten(order="F").tolist(),
                "width": 640, "height": 480,
            },
            "extrinsic": np.eye(4).flatten(order="F").tolist(),
        }
        (tmp_path / "cam.json").write_text(json.dumps(data))
        K2, ext, w, h = meshu.read_camera_json(tmp_path / "cam.json")
        np.testing.assert_allclose(K2, K)
        np.testing.assert_allclose(ext, np.eye(4))
        assert (w, h) == (640, 480)


class TestRadiusVoting:
    def test_deprecated_point_voting_semantics(self):
        # 1 frame, 1x2 image; dense pixel 0 near sparse 0, pixel 1 near both
        sparse = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
        dense = np.array([[0.05, 0, 0], [0.5, 0, 0]], np.float32)
        pc = correspondence.PointCorrespondence(sparse, dense, 0.6, 1, (1, 2))
        masks = np.array([[3, 7]], np.uint8)
        votes = pc.vote(masks, num_sparse=2, nclasses=10)
        # sparse 0 within 0.6 of both pixels -> one vote class 3, one class 7
        assert votes[0, 3] == 1 and votes[0, 7] == 1 and votes[0, 10] == 1
        # sparse 1 within 0.6 of pixel 1 only
        assert votes[1, 7] == 1 and votes[1, 10] == 1 and votes[1, 3] == 0


class TestImportHygiene:
    def test_package_import_initializes_no_backend(self):
        """Importing ANY part of the package must not contact a device:
        with the TPU tunnel down, an import-time backend init hangs every
        process (incl. the bench watchdog) before a guard can run.
        Regression: ops/neighbors once built a module-level jnp constant."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "import fusion3dseg_tpu\n"
            "import fusion3dseg_tpu.ops.label_fuse, fusion3dseg_tpu.fusion\n"
            "import fusion3dseg_tpu.pipeline, fusion3dseg_tpu.parallel\n"
            "import fusion3dseg_tpu.models, fusion3dseg_tpu.io.rtab\n"
            "from jax._src import xla_bridge\n"
            "assert not xla_bridge._backends, list(xla_bridge._backends)\n"
            "print('clean')\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "clean" in r.stdout


class TestVizAdapter:
    """utils/viz.py: optional open3d viewer adapter (VERDICT r3 next#9) —
    never a dependency, always import-safe, degrades with a named headless
    alternative."""

    def test_import_is_lazy(self):
        import sys

        from fusion3dseg_tpu.utils import viz  # noqa: F401

        # importing the adapter must NOT import open3d eagerly
        assert "open3d" not in sys.modules or viz.have_open3d()

    def test_headless_error_names_alternative(self, tmp_path):
        import numpy as np
        import pytest

        from fusion3dseg_tpu.utils import viz

        if viz.have_open3d():
            pytest.skip("open3d installed — headless path not reachable")
        with pytest.raises(RuntimeError, match="nearest_points"):
            viz.show_cloud(np.zeros((4, 3)))
        with pytest.raises(RuntimeError, match="not a dependency"):
            viz.pick_points(np.zeros((4, 3)))
        with pytest.raises(FileNotFoundError):
            viz.show_stage(tmp_path, "segmentation")
