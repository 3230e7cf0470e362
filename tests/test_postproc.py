"""Tests for refinement, door/window meshes, correspondence, planes, mesh utils."""

import numpy as np
import jax.numpy as jnp

from fusion3dseg_tpu.ops import neighbors
from fusion3dseg_tpu.pipeline import correspondence, door_window, planes, refinement
from fusion3dseg_tpu.utils import mesh as meshu
from fusion3dseg_tpu.io import artifacts

import oracle


class TestGatedFloodfill:
    def _grid_adj(self, n_side, spacing=0.1):
        xs, ys = np.meshgrid(np.arange(n_side), np.arange(n_side))
        pts = np.c_[xs.ravel() * spacing, ys.ravel() * spacing, np.zeros(n_side**2)]
        lists = oracle.radius_neighbors(pts, spacing * 1.1)
        return pts.astype(np.float32), neighbors.lists_to_adjacency(lists, 8)

    def test_grows_within_threshold(self):
        pts, adj = self._grid_adj(10)
        # values: left half 0, right half 10 (a "wall" vs "door recess")
        values = np.where(pts[:, 0] < 0.45, 0.0, 10.0).astype(np.float32)
        seeds = np.zeros(100, bool)
        seeds[0] = True
        member = np.asarray(
            refinement.gated_floodfill(jnp.asarray(adj), jnp.asarray(seeds),
                                       jnp.asarray(values), jnp.float32(1.0))
        )
        # grows over the whole left half, never crosses the value jump
        assert member[values == 0].all()
        assert not member[values == 10].any()

    def test_max_level_caps_growth(self):
        pts, adj = self._grid_adj(10)
        values = np.zeros(100, np.float32)
        seeds = np.zeros(100, bool)
        seeds[0] = True
        member = np.asarray(
            refinement.gated_floodfill(jnp.asarray(adj), jnp.asarray(seeds),
                                       jnp.asarray(values), jnp.float32(1.0),
                                       max_level=3)
        )
        assert 1 < member.sum() < 100

    def test_color_gate_multichannel(self):
        pts, adj = self._grid_adj(8)
        colors = np.zeros((64, 3), np.float32)
        colors[pts[:, 1] > 0.35] = [0.0, 0.0, 0.9]  # different color region
        seeds = np.zeros(64, bool)
        seeds[0] = True
        member = np.asarray(
            refinement.gated_floodfill(jnp.asarray(adj), jnp.asarray(seeds),
                                       jnp.asarray(colors), jnp.float32(0.2))
        )
        assert member[colors[:, 2] == 0].all()
        assert not member[colors[:, 2] > 0].any()


class TestDoorGeometry:
    def test_door_updation_snaps_to_plane_and_edges(self):
        wall = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
        normal = np.array([0.0, 1.0, 0.0])
        door = np.array(
            [[1, 0.1, 0.05], [2, 0.1, 0.05], [2, 0.1, 2], [1, 0.1, 2]], float
        )
        snapped = refinement.door_updation(wall, door, normal, max_distance=0.2)
        # all corners on the wall plane
        np.testing.assert_allclose(snapped[:, 1], 0.0, atol=1e-9)
        # bottom corners pulled to the wall's bottom edge z=0
        assert abs(snapped[0, 2]) < 1e-9 and abs(snapped[1, 2]) < 1e-9

    def test_door_floor_align_parallel_bottoms(self):
        wall = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
        theta = np.deg2rad(10)
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        door = np.array([[1, 0, 0], [2, 0, 0], [2, 0, 2], [1, 0, 2]], float) @ R.T
        aligned = refinement.door_floor_align(door, wall, flip=True)
        d_sorted = aligned[aligned[:, 2].argsort()]
        vec = d_sorted[1] - d_sorted[0]
        vec /= np.linalg.norm(vec)
        assert abs(abs(vec @ np.array([1.0, 0, 0])) - 1.0) < 1e-5


class TestDoorWindowMesh:
    def test_generate_mesh_fitted_planes(self, tmp_path):
        rng = np.random.default_rng(0)
        # a vertical "door" slab of points in plane x=0
        door = np.c_[np.zeros(200), rng.uniform(0, 1, 200), rng.uniform(0, 2, 200)]
        other = rng.uniform(3, 4, (100, 3))
        pts = np.vstack([door, other]).astype(np.float32)
        ids = np.r_[np.full(200, 1), np.zeros(100)].astype(np.int32)
        artifacts.dump_fusion_data(tmp_path, pts, nframes=1, depth_hw=(4, 4))
        pan = tmp_path / "panoptic_segmentation"
        pan.mkdir()
        np.save(pan / "ids.npy", ids)
        artifacts.write_info_json(
            pan / "info.json",
            [
                {"id": 0, "category_id": 131, "area": 100, "hexcolor": "#101010"},
                {"id": 1, "category_id": 86, "area": 200, "hexcolor": "#aa0000"},
            ],
        )
        tri_ids, verts, tris = door_window.generate_mesh(tmp_path)
        assert (pan / "door_window_mesh.ply").is_file()
        assert (pan / "triangle_ids.npy").is_file()
        assert len(tri_ids) == 2 and (tri_ids == 1).all()
        # quad lies in the x=0 plane and covers the slab extents
        np.testing.assert_allclose(verts[:, 0], 0.0, atol=1e-2)
        assert verts[:, 2].max() > 1.8 and verts[:, 2].min() < 0.2

    def test_point_in_triangle(self):
        tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        pts = np.array([[0.2, 0.2, 0], [0.9, 0.9, 0], [0.49, 0.49, 0]])
        got = door_window.points_in_triangles(pts, tri)
        np.testing.assert_array_equal(got, [True, False, True])


class TestCorrespondence:
    def _mk(self):
        # 2 frames, 2x3 images, 4 points
        uv2pt = np.array([
            [0, 1, -1, 2, 2, -1],
            [1, 1, 3, -1, 0, 2],
        ], np.int32)
        return correspondence.Correspondence(uv2pt, (2, 3))

    def test_get_point(self):
        c = self._mk()
        got = c.get_point([0, 1], np.array([[1, 0], [2, 0]]))  # (x,y)
        np.testing.assert_array_equal(got, [1, 3])

    def test_get_pixel_inverse(self):
        c = self._mk()
        imgids, coords = c.get_pixel(2)
        # point 2 seen at frame0 (x=0,y=1),(x=1,y=1) and frame1 (x=2,y=1)
        triples = sorted(zip(imgids.tolist(), coords[:, 0].tolist(), coords[:, 1].tolist()))
        assert triples == [(0, 0, 1), (0, 1, 1), (1, 2, 1)]

    def test_roundtrip_consistency(self):
        c = self._mk()
        for p in range(4):
            imgids, coords = c.get_pixel(p)
            back = c.get_point(imgids, coords)
            assert (back == p).all()

    def test_save_load(self, tmp_path):
        c = self._mk()
        c.save(tmp_path / "corr.pkl")
        c2 = correspondence.Correspondence.load(tmp_path / "corr.pkl")
        np.testing.assert_array_equal(c2.uv2pt, c.uv2pt)

    def test_point_correspondence_radius(self):
        sparse = np.array([[0, 0, 0], [5, 5, 5]], np.float32)
        h, w, F = 1, 2, 1
        dense = np.array([[0.05, 0, 0], [5.0, 5.0, 5.05]], np.float32)
        pc = correspondence.PointCorrespondence(sparse, dense, 0.2, F, (h, w))
        idx, freq = pc.get_point([0], np.array([[0, 0]]))
        np.testing.assert_array_equal(idx, [0])
        idx, freq = pc.get_point([0], np.array([[1, 0]]))
        np.testing.assert_array_equal(idx, [1])


class TestPlanes:
    def test_legends(self):
        assert planes.obj("Doors") == 6
        assert planes.reveal_shape(1) == 1  # wall -> plane
        assert planes.reveal_shape(4) == 2  # beam -> cuboid

    def test_vids_roundtrip(self, tmp_path, rng):
        a = rng.normal(size=(30, 3)) * 0.05
        b = rng.normal(size=(30, 3)) * 0.05 + 5
        groups = planes.run_connected(np.vstack([a, b]).astype(np.float32), 0.5)
        assert sorted(len(g) for g in groups) == [30, 30]
        planes.write_vids_csv(tmp_path / "v.csv", groups)
        back = planes.read_vids_csv(tmp_path / "v.csv")
        assert sorted(len(g) for g in back) == [30, 30]


class TestMeshUtils:
    def test_keep_faces(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
        tris = np.array([[0, 1, 2], [1, 3, 2]])
        keep = np.array([True, True, True, False])
        v2, t2, used, fk = meshu.keep_faces_by_vertex_mask(verts, tris, keep)
        assert len(v2) == 3 and len(t2) == 1
        np.testing.assert_array_equal(t2[0], [0, 1, 2])

    def test_connected_triangle_clusters(self):
        tris = np.array([[0, 1, 2], [1, 2, 3], [4, 5, 6]])
        labels = meshu.connected_triangle_clusters(tris, 7)
        assert labels[0] == labels[1] != labels[2]

    def test_nearest_and_box_select(self, rng):
        pts = rng.normal(size=(100, 3))
        q = pts[17] + 1e-4
        assert meshu.nearest_points(pts, q)[0] == 17
        sel = meshu.select_in_box(pts, [-10, -10, -10], [10, 10, 10])
        assert len(sel) == 100

    def test_vertex_triangle_maps(self):
        tris = np.array([[0, 1, 2], [1, 2, 3]])
        offsets, tids = meshu.vertex_triangle_maps(tris, 4)
        assert list(tids[offsets[1]:offsets[2]]) in ([0, 1], [1, 0])
        assert offsets[4] == 6


def _box_from_corners(corners):
    """Invert obb_corners' sign-enumeration layout: corner[i] = center +
    sum_d sign_d(i) * half_d * axes_d with signs (sx,sy,sz) nested (-1,1).
    Returns (center [3], axes [3,3] rows, half [3])."""
    center = corners.mean(axis=0)
    vecs = np.stack([
        (corners[4] - corners[0]) / 2.0,  # sx flips at bit 2
        (corners[2] - corners[0]) / 2.0,  # sy flips at bit 1
        (corners[1] - corners[0]) / 2.0,  # sz flips at bit 0
    ])
    half = np.linalg.norm(vecs, axis=1)
    axes = vecs / np.maximum(half[:, None], 1e-12)
    return center, axes, half


class TestMergeBBHostRederive:
    """merge_bb re-derives post-merge OBBs on host (no second device
    dispatch): unmerged instances keep the device program's box, merged
    roots get a NumPy PCA box over the union of member points."""

    def _scene(self, rng):
        # inst 1 and 2 overlap (same parent) -> merge; inst 3 is far away
        a = rng.uniform(0, 1, (400, 3))
        b = rng.uniform(0.8, 1.8, (400, 3))       # overlaps a
        c = rng.uniform(5, 6, (400, 3))
        bg = rng.uniform(-2, -1, (50, 3))          # instance 0 (never merged)
        pts = np.vstack([bg, a, b, c]).astype(np.float32)
        ids = np.r_[
            np.zeros(50, np.int32), np.full(400, 1, np.int32),
            np.full(400, 2, np.int32), np.full(400, 3, np.int32),
        ]
        info = [
            {"id": 0, "parent_id": -1, "area": 50},
            {"id": 1, "parent_id": 7, "area": 400},
            {"id": 2, "parent_id": 7, "area": 400},
            {"id": 3, "parent_id": 7, "area": 400},
        ]
        return pts, ids, info

    def test_merge_and_boxes(self, tmp_path, rng):
        from fusion3dseg_tpu.pipeline.merge_bb import merge_bb

        pts, ids, info = self._scene(rng)
        new_info, new_ids = merge_bb(tmp_path, info, ids, pts, verbose=False)
        got_ids = sorted(int(i["id"]) for i in new_info)
        assert got_ids == [0, 1, 3]                 # 2 merged into 1
        assert not (new_ids == 2).any()
        merged = next(i for i in new_info if i["id"] == 1)
        assert merged["area"] == 800
        # merged root's recomputed box must contain every member point
        corners = np.asarray(merged["bbox"], np.float32)
        assert corners.shape == (8, 3)
        members = pts[new_ids == 1]
        center = corners.mean(axis=0)
        # reconstruct axes/half from the corner layout (sign enumeration)
        from fusion3dseg_tpu.ops import obb as obb_ops

        c2, ax2, hf2 = obb_ops.pca_obb_np(members)
        local = (members - c2) @ ax2.T
        assert np.all(np.abs(local) <= hf2 + 1e-4)
        np.testing.assert_allclose(center, c2, atol=1e-3)
        # unmerged instance keeps a valid box containing its members
        far = next(i for i in new_info if i["id"] == 3)
        fc = np.asarray(far["bbox"], np.float32)
        assert fc.min() > 4.0 and fc.max() < 7.0

    def test_backend_host_matches_device(self, tmp_path, rng):
        """backend='host' (the auto default at pipeline scale) and
        backend='device' produce identical merges, ids and areas."""
        from fusion3dseg_tpu.pipeline.merge_bb import merge_bb

        pts, ids, info = self._scene(rng)
        import copy

        outs = {}
        for be in ("host", "device"):
            ni, nids = merge_bb(
                tmp_path / be, copy.deepcopy(info), ids.copy(), pts,
                verbose=False, backend=be,
            )
            outs[be] = (ni, nids)
        ih, idh = outs["host"]
        idv, iddv = outs["device"]
        assert [i["id"] for i in ih] == [i["id"] for i in idv]
        assert [i["area"] for i in ih] == [i["area"] for i in idv]
        np.testing.assert_array_equal(idh, iddv)
        # boxes can differ in axis choice on near-isotropic clusters (PCA is
        # ill-conditioned there, f32 device vs f64 host); the contract is
        # containment: every box holds all of its instance's member points
        for variant, (ni, nids) in outs.items():
            for inf in ni[1:]:
                corners = np.asarray(inf["bbox"], np.float32)
                members = pts[nids == inf["id"]]
                c, ax, hf = _box_from_corners(corners)
                local = (members - c) @ ax.T
                assert np.all(np.abs(local) <= hf + 1e-3), variant

    def test_bad_backend_raises(self, tmp_path, rng):
        from fusion3dseg_tpu.pipeline.merge_bb import merge_bb

        pts, ids, info = self._scene(rng)
        import pytest

        with pytest.raises(ValueError):
            merge_bb(tmp_path, info, ids, pts, verbose=False, backend="gpu")

    def test_host_adjacency_split_matches_device(self, rng):
        """The e2e path builds adjacency on host (native grid hash) while
        the device votes; instances must match a device-built graph."""
        from fusion3dseg_tpu.io import native
        from fusion3dseg_tpu.ops import components

        if not native.available():
            import pytest

            pytest.skip("native lib unavailable")
        # three clusters + noise, multiple classes
        pts = np.vstack([
            rng.uniform(0, 0.5, (500, 3)),
            rng.uniform(2, 2.5, (500, 3)),
            rng.uniform(4, 4.5, (300, 3)),
        ]).astype(np.float32)
        classes = np.r_[
            np.zeros(500, np.int32), np.ones(500, np.int32),
            np.full(300, 1, np.int32),
        ]
        r = 0.12
        adj_host = native.radius_graph(pts, r, k=16)
        adj_dev = np.asarray(neighbors.radius_graph(jnp.asarray(pts), r, k=16))
        out_h = components.split_into_instances(classes, adj_host, 133, None, 10)
        out_d = components.split_into_instances(classes, adj_dev, 133, None, 10)
        np.testing.assert_array_equal(out_h[1], out_d[1])
        assert out_h[2] == out_d[2]
