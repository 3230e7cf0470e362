"""End-to-end pipeline tests on a synthetic session (SURVEY.md §4 golden tests)."""

from pathlib import Path

import numpy as np
import pytest

from fusion3dseg_tpu.io import synthetic, rtab, ply
from fusion3dseg_tpu.pipeline import process3d, get3dseg


@pytest.fixture(scope="module")
def session_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("session")
    sess = synthetic.make_session(nframes=16, depth_hw=(64, 48))
    synthetic.write_session_dir(sess, out)
    return out, sess


class TestSyntheticSession:
    def test_raycast_matches_brute_force(self):
        """The batched f32 slab test (one [N,B] pass, argmin winner) must
        match a per-ray/per-box scalar oracle: nearest valid box entry
        wins, first box on exact ties, room exit face otherwise."""
        rng = np.random.default_rng(11)
        room = np.array([0, 0, 0, 4.0, 2.5, 5.0])
        boxes = []
        for _ in range(7):
            lo = rng.uniform(0, 3, 3)
            boxes.append(np.r_[lo, np.minimum(lo + rng.uniform(0.1, 1.5, 3),
                                              room[3:])])
        boxes = np.asarray(boxes)
        bcls = rng.integers(50, 120, 7).astype(np.uint8)
        eye = np.array([2.0, 1.2, 2.5])
        dirs = rng.normal(size=(400, 3))
        # exact axis-aligned + near-parallel rays: a parallel axis must
        # never bound the room exit (the 1e12-inv fallback used to produce
        # a negative exit t that "escaped" the closed room)
        dirs = np.vstack([dirs,
                          np.eye(3), -np.eye(3),
                          [[1e-13, 1.0, 0.0], [1.0, 0.0, 1e-13]]])
        max_depth = 8.0
        t, cls, nrm, inst = synthetic._raycast(
            eye, dirs, room, boxes, bcls, max_depth, return_normals=True)
        for i in range(len(dirs)):
            d = dirs[i]
            inv = np.where(np.abs(d) > 1e-12, 1.0 / d, 1e12)
            # room exit: parallel axes never bound it
            t_far = np.where(np.abs(d) <= 1e-12, np.inf,
                             np.where(d > 0, (room[3:] - eye) * inv,
                                      (room[:3] - eye) * inv))
            t_ref, inst_ref = float(t_far.min()), -1
            for b in range(len(boxes)):
                t1 = (boxes[b, :3] - eye) * inv
                t2 = (boxes[b, 3:] - eye) * inv
                tmin = np.minimum(t1, t2).max()
                tmax = np.maximum(t1, t2).min()
                if tmax >= tmin > 1e-6 and tmin < t_ref - 1e-4:
                    t_ref, inst_ref = float(tmin), b
            if t_ref < max_depth - 1e-3:
                assert abs(t[i] - t_ref) < 1e-3, i
            else:
                assert t[i] == 0.0, i  # beyond range -> invalid depth
            if inst[i] == inst_ref and inst_ref >= 0:
                assert cls[i] == bcls[inst_ref], i
            else:
                # near-tie between overlapping boxes: depth must still agree
                assert abs(min(t[i] if t[i] else max_depth, max_depth)
                           - min(t_ref, max_depth)) < 1e-3, i
            # normals: unit axis vector pointing against the ray
            assert abs(np.linalg.norm(nrm[i]) - 1.0) < 1e-6
            assert nrm[i] @ d < 1e-6

    def test_session_roundtrip(self, session_dir):
        out, sess = session_dir
        sd = rtab.SessionData.from_export_dir(out)
        assert sd.nframes == sess.nframes
        assert sd.depth_hw == (64, 48)
        # depth written as mm png survives the roundtrip
        np.testing.assert_allclose(
            sd.depth[0], sess.depth[0].reshape(-1), atol=2e-3
        )
        # back-projected floor points are at y≈0 in world frame
        floor = sess.gt_mask[0].reshape(-1) == synthetic.FLOOR_CLASS
        if floor.any():
            assert np.abs(sd.points[0][floor][:, 1]).max() < 0.1

    def test_shape_priors(self):
        """Object classes carry characteristic geometry (the only
        session-stable class cue under textured appearance): doors reach
        the floor in a wall plane, windows sit at sill height, TVs hang
        high, couches are long and low."""
        for seed in (3, 41):
            sess = synthetic.make_session(
                nframes=2, depth_hw=(32, 24),
                room=synthetic.RoomSpec(seed=seed, num_objects=12),
            )
            sx, sy, sz = sess.room.size
            for box, cls_ in zip(sess.boxes, sess.box_classes):
                x0, y0, z0, x1, y1, z1 = box
                dims = np.array([x1 - x0, y1 - y0, z1 - z0])
                if cls_ in (86, 114, 115, 62):  # flush wall panels
                    thin = min(dims[0], dims[2])
                    assert thin < 0.1, (cls_, box)
                    at_wall = (
                        x0 < 1e-6 or z0 < 1e-6
                        or abs(x1 - sx) < 1e-6 or abs(z1 - sz) < 1e-6
                    )
                    assert at_wall, (cls_, box)
                if cls_ == 86:  # door: floor to ~2m
                    assert y0 == 0.0 and 1.8 <= y1 <= 2.2
                if cls_ in (114, 115):  # window: off the floor
                    assert y0 >= 0.85
                if cls_ == 114:  # blind: wide + short
                    w = max(dims[0], dims[2])
                    assert w / dims[1] > 1.6
                if cls_ == 62:  # tv mounted high
                    assert y0 >= 1.35
                if cls_ == 57:  # couch: long x low on the floor
                    assert y0 == 0.0 and dims[1] <= 0.9
                    assert max(dims[0], dims[2]) >= 1.5
                if cls_ == 66:  # keyboard: tiny flat slab
                    assert y0 == 0.0 and dims[1] < 0.06

    def test_cache_roundtrip(self, session_dir, tmp_path):
        out, sess = session_dir
        sd = rtab.SessionData.from_export_dir(out)
        sub = sd.write_cache(tmp_path)
        sd2 = rtab.SessionData.from_cache(
            tmp_path / "PointcloudMergeResults" / f"tofsegment_{sub}.pkl",
            tmp_path / "PointcloudMergeResults" / f"rtscameradata_{sub}.pkl",
        )
        np.testing.assert_allclose(sd2.points, sd.points, atol=1e-4)
        np.testing.assert_allclose(sd2.depth, sd.depth, atol=1e-4)
        assert sd2.depth_hw == sd.depth_hw


class TestPly:
    def test_pointcloud_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        clr = rng.random((100, 3)).astype(np.float32)
        nrm = rng.normal(size=(100, 3)).astype(np.float32)
        ply.write_point_cloud(tmp_path / "a.ply", pts, colors=clr, normals=nrm)
        p2, c2, n2 = ply.read_point_cloud(tmp_path / "a.ply")
        np.testing.assert_allclose(p2, pts, atol=1e-6)
        np.testing.assert_allclose(c2, clr, atol=1 / 255.0)
        np.testing.assert_allclose(n2, nrm, atol=1e-6)

    def test_mesh_roundtrip(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
        cols = np.array([[255, 0, 0]] * 4, np.uint8)
        ply.write_mesh(tmp_path / "m.ply", verts, tris, cols)
        v2, t2, c2 = ply.read_mesh(tmp_path / "m.ply")
        np.testing.assert_allclose(v2, verts)
        np.testing.assert_array_equal(t2, tris)
        np.testing.assert_array_equal(c2, cols)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def fused(self, session_dir, tmp_path_factory):
        out, sess = session_dir
        work = tmp_path_factory.mktemp("work")
        sd = rtab.SessionData.from_export_dir(out)
        result = process3d.process3DSeg(
            out, work,
            radius=0.08, angle=20, stride=6,
            point_range=(0.1, 8.0), min_occ=3,
            capacity=1 << 16, verbose=False, session=sd,
        )
        return out, sess, work, result

    def test_fusion_artifacts(self, fused):
        out, sess, work, result = fused
        pts, norms, clrs, nmerges, occ, nframes, hw, adj = result
        assert (work / "fusion" / "fusion_data.pkl").is_file()
        assert (work / "fusion" / "adj.pkl").is_file()
        assert len(list((work / "fusion" / "uv2pt").glob("*.npy"))) == sess.nframes
        uv = np.load(next((work / "fusion" / "uv2pt").glob("*.npy")))
        assert uv.dtype == np.int32 and uv.shape == (64 * 48,)
        assert uv.max() < len(pts)
        assert len(adj) == len(pts)
        assert 0 < len(pts) < sess.nframes * 64 * 48

    def test_segment_and_artifacts(self, fused):
        out, sess, work, result = fused
        votes, classes = get3dseg.segment(
            work, Path(out) / "masks",
            threshold=0.5, nclasses=133,
            filter_classes=None, min_pts_per_inst=30, verbose=False,
        )
        seg = Path(work) / "segmentation"
        pan = Path(work) / "panoptic_segmentation"
        for f in ("votes.npy", "classes.npy", "info.json", "pcd.ply", "final_pcd.ply"):
            assert (seg / f).is_file(), f
        for f in ("ids.npy", "info.json", "pcd.ply", "final_info.json"):
            assert (pan / f).is_file(), f

        # geometric ground truth: points classified floor lie near y=0,
        # ceiling near y=H, walls near a wall plane
        pts = result[0]
        cls = np.load(seg / "classes.npy")
        sy = sess.room.size[1]
        floor = cls == synthetic.FLOOR_CLASS
        ceil = cls == synthetic.CEILING_CLASS
        assert floor.sum() > 10 and ceil.sum() > 10
        assert np.abs(pts[floor][:, 1]).mean() < 0.15
        assert np.abs(pts[ceil][:, 1] - sy).mean() < 0.15

        # label agreement vs per-point geometric ground truth; junction
        # points (near two surfaces) carry arbitrary GT and are excluded
        gt = _geometric_gt(pts, sess)
        known = gt >= 0
        agree = (cls[known] == gt[known]).mean()
        assert agree > 0.95, f"label agreement {agree:.3f}"

    def test_remove_classes(self, fused):
        out, sess, work, result = fused
        remaining = get3dseg.remove_classes(work, Path(out) / "masks", verbose=False)
        seg = Path(work) / "segmentation"
        assert (seg / "remaining_mask.npy").is_file()
        assert (seg / "cleaned.ply").is_file()
        assert (seg / "remaining.ply").is_file()
        assert (seg / "removed_objects_info" / "classes.npy").is_file()
        # building surfaces survive; remove_classes reclassifies at the
        # stricter 0.75 threshold so mixed-vote junction points drop out
        cls = np.load(seg / "classes.npy")
        floor = cls == synthetic.FLOOR_CLASS
        assert remaining[floor].mean() > 0.7
        # and removable object classes (couch/tv/keyboard — not doors or
        # windows, which are building classes) are dropped
        obj = np.isin(cls, [57, 62, 66])
        if obj.sum() > 10:
            assert remaining[obj].mean() < 0.3


def _geometric_gt(pts, sess, tol=0.12, amb_tol=0.2):
    """Ground-truth class of fused points from the synthetic room geometry.

    Points within amb_tol of two or more surfaces (wall/floor corners,
    object-wall contacts) get gt = -1: their true label is arbitrary and
    fused positions are radius-smeared means.
    """
    sx, sy, sz = sess.room.size
    gt = np.full(len(pts), -1, np.int64)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    gt[np.abs(y) < tol] = synthetic.FLOOR_CLASS
    gt[np.abs(y - sy) < tol] = synthetic.CEILING_CLASS
    wall = (
        (np.abs(x) < tol) | (np.abs(x - sx) < tol)
        | (np.abs(z) < tol) | (np.abs(z - sz) < tol)
    )
    gt[wall & (gt == -1)] = synthetic.WALL_CLASS
    nsurf = (
        (np.abs(y) < amb_tol).astype(int) + (np.abs(y - sy) < amb_tol)
        + (np.abs(x) < amb_tol) + (np.abs(x - sx) < amb_tol)
        + (np.abs(z) < amb_tol) + (np.abs(z - sz) < amb_tol)
    )
    for b, c in zip(sess.boxes, sess.box_classes):
        inb = (
            (x > b[0] - tol) & (x < b[3] + tol)
            & (y > b[1] - tol) & (y < b[4] + tol)
            & (z > b[2] - tol) & (z < b[5] + tol)
        )
        gt[inb] = c
        nearb = (
            (x > b[0] - amb_tol) & (x < b[3] + amb_tol)
            & (y > b[1] - amb_tol) & (y < b[4] + amb_tol)
            & (z > b[2] - amb_tol) & (z < b[5] + amb_tol)
        )
        nsurf += nearb.astype(int)
    gt[nsurf >= 2] = -1
    return gt


class TestUprightConvention:
    def test_upright_is_180_rotation_with_floor_at_bottom(self):
        """The staged corrected camera convention (ROADMAP #13): upright
        renders are the exact 180-degree in-image rotation of legacy ones,
        and put the floor at the image bottom like a physically upright
        camera."""
        a = synthetic.make_session(nframes=2, depth_hw=(48, 36), upright=False)
        b = synthetic.make_session(nframes=2, depth_hw=(48, 36), upright=True)
        np.testing.assert_array_equal(a.gt_mask[0][::-1, ::-1], b.gt_mask[0])
        np.testing.assert_allclose(a.depth[0][::-1, ::-1], b.depth[0], atol=1e-5)
        floor = np.where((b.gt_mask[0] == synthetic.FLOOR_CLASS).any(axis=1))[0]
        ceil = np.where((b.gt_mask[0] == synthetic.CEILING_CLASS).any(axis=1))[0]
        assert floor.mean() > 24 > ceil.mean()
