"""Determinism + artifact-contract tests (SURVEY.md §4 bullet 4, §5).

The reference's results depend on np.random.shuffle visit order
(fusion.py:172-173); a design goal here is bitwise determinism — same
inputs, same outputs, every run. And the stage artifacts ARE the public API:
their names, dtypes and layouts are contract-tested explicitly.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from fusion3dseg_tpu.fusion import fusion as F
from fusion3dseg_tpu.io import artifacts, rtab, synthetic
from fusion3dseg_tpu.ops import voting
from fusion3dseg_tpu.pipeline import get3dseg, process3d


@pytest.fixture(scope="module")
def small_session():
    sess = synthetic.make_session(nframes=8, depth_hw=(48, 36))
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    return sess, sd


class TestDeterminism:
    def test_fusion_bitwise_deterministic(self, small_session):
        sess, sd = small_session
        h, w = sd.depth_hw
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        args = (
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            jnp.asarray(valid),
        )
        kw = dict(height=h, width=w, radius=0.08,
                  min_cosine=0.94, max_depth=8.0, capacity=1 << 14)
        s1, uv1 = F.fuse_session(*args, **kw)
        s2, uv2 = F.fuse_session(*args, **kw)
        np.testing.assert_array_equal(np.asarray(uv1), np.asarray(uv2))
        np.testing.assert_array_equal(np.asarray(s1.points), np.asarray(s2.points))
        np.testing.assert_array_equal(np.asarray(s1.nmerges), np.asarray(s2.nmerges))

    def test_voting_bitwise_deterministic(self, rng):
        uv2pt = jnp.asarray(rng.integers(-1, 100, (5, 200)), jnp.int32)
        masks = jnp.asarray(rng.integers(0, 10, (5, 200)), jnp.uint8)
        v1 = voting.vote_all_frames(uv2pt, masks, 100, 10, dedup=True)
        v2 = voting.vote_all_frames(uv2pt, masks, 100, 10, dedup=True)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


class TestArtifactContracts:
    """Names, dtypes, shapes of every stage artifact (SURVEY.md §1 table)."""

    @pytest.fixture(scope="class")
    def run_dirs(self, tmp_path_factory):
        sess = synthetic.make_session(nframes=8, depth_hw=(48, 36))
        out = tmp_path_factory.mktemp("sess")
        work = tmp_path_factory.mktemp("work")
        synthetic.write_session_dir(sess, out)
        process3d.process3DSeg(
            out, work, radius=0.1, angle=20, stride=6,
            point_range=(0.1, 8.0), capacity=1 << 14,
        )
        get3dseg.segment(work, out / "masks", filter_classes=None,
                         min_pts_per_inst=10, verbose=False)
        return out, work

    def test_uv2pt_contract(self, run_dirs):
        out, work = run_dirs
        files = list((work / "fusion" / "uv2pt").glob("*.npy"))
        assert len(files) == 8
        uv = np.load(files[0])
        assert uv.dtype == np.int32
        assert uv.shape == (48 * 36,)
        assert uv.min() >= -1

    def test_fusion_data_contract(self, run_dirs):
        _, work = run_dirs
        pts, nrm, clr, nm, occ, nframes, hw, adj = artifacts.load_fusion_data(work)
        n = len(pts)
        assert pts.shape == (n, 3) and nrm.shape == (n, 3) and clr.shape == (n, 3)
        assert nm.shape == (n,) and occ.shape == (n,)
        assert occ.dtype == np.uint32  # reference dtype (fusion.py:246)
        assert nframes == 8 and tuple(hw) == (48, 36)
        assert adj is not None and len(adj) == n
        assert adj.dtype == object  # reference adj.pkl format (fusion.py:377)

    def test_segmentation_contract(self, run_dirs):
        _, work = run_dirs
        seg = work / "segmentation"
        votes = np.load(seg / "votes.npy")
        classes = np.load(seg / "classes.npy")
        n = len(classes)
        assert votes.shape == (n, 134)
        assert classes.dtype in (np.int32, np.int64)
        assert classes.max() <= 133
        info = json.loads((seg / "info.json").read_text())
        for entry in info:
            assert set(entry) >= {"category_id", "name", "area", "hexcolor"}
            assert entry["hexcolor"].startswith("#") and len(entry["hexcolor"]) == 7

    def test_panoptic_contract(self, run_dirs):
        _, work = run_dirs
        pan = work / "panoptic_segmentation"
        ids = np.load(pan / "ids.npy")
        info = json.loads((pan / "info.json").read_text())
        for entry in info:
            assert set(entry) >= {
                "id", "isthing", "category_id", "area", "hexcolor", "name",
                "parent_id", "parent_name", "bbox",
            }
        final = json.loads((pan / "final_info.json").read_text())
        assert isinstance(final, list)
        # bbox entries are 8 corner points
        for entry in final:
            if entry.get("bbox"):
                assert len(entry["bbox"]) == 8 and len(entry["bbox"][0]) == 3

    def test_ply_contract(self, run_dirs):
        _, work = run_dirs
        from fusion3dseg_tpu.io import ply

        for rel in ("segmentation/pcd.ply", "segmentation/final_pcd.ply",
                    "panoptic_segmentation/pcd.ply"):
            pts, colors, _ = ply.read_point_cloud(work / rel)
            assert pts.dtype == np.float32 and colors is not None

    def test_taxonomy_csv_roundtrip(self, tmp_path):
        from fusion3dseg_tpu.pipeline.get3dseg import load_csv
        from fusion3dseg_tpu.utils import taxonomy as tax

        t = tax.Taxonomy()
        t.to_csv(tmp_path / "classes.csv")
        t2 = tax.Taxonomy.from_csv(tmp_path / "classes.csv")
        assert t2.parent_ids == t.parent_ids
        assert t2.flag_objremoval == t.flag_objremoval
        # real class names survive the 134-row round trip (review r3:
        # n=134 used to degrade names to '0'..'133')
        assert t2.class_names[:len(t.class_names)] == list(t.class_names)
        # the reference load_csv 5-tuple contract (get3DSeg.py:357-367)
        class_id, parent_name, parent_id, flag_infojson, building = load_csv(
            tmp_path / "classes.csv"
        )
        # 134 rows: COCO-133 plus the trailing class 133 'unclassified'
        # (the reference's classes.csv carries it, get3DSeg.py:430-431)
        assert class_id == list(range(134))
        assert len(parent_name) == 134 and len(parent_id) == 134
        assert parent_name[133] == "unclassified" and 133 not in building
        # doors/windows/walls are building classes (kept by remove_classes)
        assert 86 in building and 114 in building and 131 in building
        # couch/tv are removable objects
        assert 57 not in building and 62 not in building

    def test_load_semantic_segmentation(self, run_dirs):
        from fusion3dseg_tpu.pipeline.get3dseg import load_semantic_segmentation

        _, work = run_dirs
        votes, classes, classes2, uniq, info = load_semantic_segmentation(
            work / "segmentation"
        )
        assert votes.shape[0] == classes.shape[0]
        assert set(uniq.tolist()) == set(np.unique(classes).tolist())
        assert isinstance(info, list) and info

    def test_votes_warm_start(self, run_dirs):
        # votes.npy warm start (reference voting.py:30-40, get3DSeg.py:158-165)
        out, work = run_dirs
        votes1 = np.load(work / "segmentation" / "votes.npy")
        votes2 = get3dseg.vote_session(
            work, out / "masks", len(votes1), (48, 36), 133,
            votes_file=work / "segmentation" / "votes.npy",
        )
        np.testing.assert_array_equal(votes1, votes2)


class TestConfigDrift:
    def test_config_defaults_match_stage_signatures(self):
        """config.py's dataclasses are the canonical default record; this
        pins them against the live stage signatures so they cannot drift
        silently (review finding r3: max_depth had already diverged)."""
        import inspect

        from fusion3dseg_tpu import config as cfg
        from fusion3dseg_tpu.pipeline.get2dseg import SegmentImage
        from fusion3dseg_tpu.pipeline.get3dseg import segment
        from fusion3dseg_tpu.pipeline.process3d import process3DSeg

        def defaults(fn):
            return {
                k: v.default for k, v in inspect.signature(fn).parameters.items()
                if v.default is not inspect.Parameter.empty
            }

        d = defaults(process3DSeg)
        f = cfg.FusionConfig()
        assert f.radius == d["radius"] and f.angle == d["angle"]
        assert f.stride == d["stride"] and f.point_range == d["point_range"]
        assert f.decimation == d["decimation"] and f.min_occ == d["min_occ"]
        assert f.capacity == d["capacity"]
        assert f.max_depth is None  # documented: None = point_range[1]
        from fusion3dseg_tpu.fusion import Fusion

        assert f.window_policy == Fusion.window_policy  # dataclass default

        d = defaults(segment)
        v = cfg.VotingConfig()
        assert v.threshold == d["threshold"] and v.nclasses == d["nclasses"]
        assert tuple(v.filter_classes) == tuple(d["filter_classes"])
        assert v.min_pts_per_inst == d["min_pts_per_inst"]

        d = defaults(SegmentImage)
        s2 = cfg.Seg2DConfig()
        assert s2.extension == d["extension"]
        assert s2.conf_threshold == d["conf_threshold"]
        assert s2.filter_classes == d["filter_classes"]
