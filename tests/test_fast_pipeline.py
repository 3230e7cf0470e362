"""segment_session_fast: the in-memory one-call pipeline.

Stage semantics must match the two-call device sequence (fusion then
vote) and the host split/merge contracts — the fast path exists to cut
dispatch round-trips, not to change numerics.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fusion3dseg_tpu.fusion import fuse_session
from fusion3dseg_tpu.io import rtab, synthetic
from fusion3dseg_tpu.ops import voting
from fusion3dseg_tpu.pipeline.fast import segment_session_fast


def _session(seed=21, F=6, hw=(48, 36)):
    sess = synthetic.make_session(
        nframes=F, depth_hw=hw, room=synthetic.RoomSpec(seed=seed)
    )
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    return sess, sd


class TestFastSegmentation:
    def test_gt_mask_path_matches_stage_sequence(self):
        sess, sd = _session()
        cap = 1 << 13
        res = segment_session_fast(
            sd, masks=sess.gt_mask, radius=0.1, angle=25.0,
            capacity=cap, window=None, min_pts_per_inst=20,
        )
        # reference: the explicit two-call device sequence
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        fargs = tuple(jnp.asarray(x) for x in (
            sd.Ks.astype(np.float32), sd.quats_wxyz, sd.translations,
            sd.points, sd.normals, sd.colors, valid,
        ))
        st_ref, uv_ref = fuse_session(
            *fargs, height=48, width=36, radius=0.1,
            min_cosine=float(np.cos(np.deg2rad(25.0))), max_depth=8.0,
            capacity=cap,
        )
        _, cls_ref = voting.vote_and_classify(
            uv_ref, jnp.asarray(sess.gt_mask.reshape(len(sess.gt_mask), -1)),
            cap, 133, threshold=0.5,
        )
        n = int(st_ref.n)
        assert res.n == n
        np.testing.assert_array_equal(res.classes, np.asarray(cls_ref)[:n])
        np.testing.assert_array_equal(
            res.points, np.asarray(st_ref.points)[:n]
        )
        # normals/colors are lazy D2H transfers (the segmentation never
        # reads them); first access materializes the live prefix
        np.testing.assert_array_equal(
            res.normals, np.asarray(st_ref.normals)[:n]
        )
        np.testing.assert_array_equal(
            res.colors, np.asarray(st_ref.colors)[:n]
        )
        # instance contract: per-point ids cover the cloud, info has the
        # split + taxonomy fields
        assert res.instance_ids.shape == (n,)
        assert len(res.instance_info) > 0
        for inf in res.instance_info:
            assert {"id", "category_id", "area", "parent_id"} <= set(inf)

    def test_auto_window_and_outdir(self, tmp_path):
        sess, sd = _session(seed=22, F=4)
        res = segment_session_fast(
            sd, masks=sess.gt_mask, radius=0.1, angle=25.0,
            capacity=1 << 13, window="auto", window_policy="split",
            min_pts_per_inst=20, outdir=tmp_path,
        )
        assert res.n > 0 and res.classes.shape == (res.n,)
        assert (tmp_path / "panoptic_segmentation").is_dir()

    def test_segmenter_path_contracts(self):
        """Model-streamed variant: mechanics only (random tiny weights)."""
        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.pipeline.get2dseg import Segmenter2D

        sess, sd = _session(seed=23, F=4)
        seg = Segmenter2D(
            config=SegFormerConfig.named("b0"), checkpoint_dir=None,
            input_hw=(64, 64), batch_size=4,
        )
        res = segment_session_fast(
            sd, segmenter=seg, radius=0.1, angle=25.0,
            capacity=1 << 13, window=None, min_pts_per_inst=20,
        )
        assert res.classes.shape == (res.n,)
        assert res.classes.dtype == np.int32
        assert set(np.unique(res.classes)) <= set(range(134))

    def test_rejects_ambiguous_label_source(self):
        sess, sd = _session(seed=24, F=3)
        with pytest.raises(ValueError):
            segment_session_fast(sd)
        with pytest.raises(ValueError):
            segment_session_fast(sd, masks=sess.gt_mask, segmenter=object())

    def test_rejects_dedup_false_on_segmenter_path(self):
        """stream_segment is inherently per-(point, frame) deduplicated;
        silently returning dedup'd votes for dedup=False would diverge
        from the masks path (review r4)."""
        _, sd = _session(seed=25, F=3)
        with pytest.raises(ValueError, match="dedup"):
            segment_session_fast(sd, segmenter=object(), dedup=False)

    def test_out_of_taxonomy_parent_is_none(self):
        """Categories outside the taxonomy get parent_id None (like
        master_classes), NOT the raw category id — merge_bb maps None to
        -1 so it can't collide with a genuine parent id (review r4)."""
        from fusion3dseg_tpu.utils import taxonomy as tax

        sess, sd = _session(seed=26, F=4)
        tiny = tax.Taxonomy(class_names=["wall", "floor"])  # ids 0..1 only
        res = segment_session_fast(
            sd, masks=sess.gt_mask, radius=0.1, angle=25.0,
            capacity=1 << 13, window=None, min_pts_per_inst=20,
            taxonomy=tiny, merge_obbs=False,
        )
        cats = {int(i["category_id"]) for i in res.instance_info}
        assert any(c > 1 for c in cats)  # the room has classes beyond 0/1
        for inf in res.instance_info:
            assert inf["parent_id"] == (
                tiny.parent_ids[inf["category_id"]]
                if inf["category_id"] <= 1 else None
            ), inf

    def test_big_capacity_sliced_transfer_matches(self):
        """capacity > _FULL_TRANSFER_MAX_CAP switches to device-sliced O(n)
        transfers; results must be identical to the full-buffer strategy."""
        sess, sd = _session(seed=27, F=3)
        masks = np.minimum(sess.gt_mask, 19)  # keep the vote table small
        kw = dict(radius=0.1, angle=25.0, window=None, nclasses=20,
                  min_pts_per_inst=20, merge_obbs=False)
        small = segment_session_fast(sd, masks=masks, capacity=1 << 13, **kw)
        big = segment_session_fast(sd, masks=masks, capacity=1 << 19, **kw)
        assert big.n == small.n
        np.testing.assert_array_equal(big.points, small.points)
        np.testing.assert_array_equal(big.classes, small.classes)
        np.testing.assert_array_equal(big.normals, small.normals)

    def test_overflow_autodedup_on_revisit(self):
        """A loop-closure session whose visible span exceeds the window
        must surface overflow telemetry, and the default auto_dedup must
        repair the appended duplicates (VERDICT r4 #2)."""
        sess = synthetic.make_session(nframes=16, depth_hw=(48, 36),
                                      turns=2.0)
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        masks = np.minimum(sess.gt_mask, 19)
        kw = dict(radius=0.08, angle=20.0, nclasses=20, capacity=1 << 15,
                  min_pts_per_inst=20, merge_obbs=False)
        W = 1 << 12
        raw = segment_session_fast(sd, masks=masks, window=W,
                                   window_policy="newest",
                                   auto_dedup=False, **kw)
        fixed = segment_session_fast(sd, masks=masks, window=W,
                                     window_policy="newest", **kw)
        full = segment_session_fast(sd, masks=masks, window=None, **kw)
        # telemetry: both windowed runs report the same overflow
        assert raw.overflow_frames > 0
        assert fixed.overflow_frames == raw.overflow_frames
        assert raw.spans.shape == (16,) and raw.spans.max() > W
        assert full.overflow_frames == 0  # unwindowed cannot overflow
        # the repair: raw duplicates >> fixed, and fixed lands at or
        # below the full merge (dedup also folds the full merge's own
        # sub-radius cross-frame pairs)
        assert raw.n > full.n * 1.2
        assert fixed.n <= full.n * 1.02
        # remapped uv2pt stays consistent with the compacted buffer
        uv = np.asarray(fixed.uv2pt)
        assert uv.max() < fixed.n
        # classes come from the exact re-vote on the deduped cloud: the
        # dominant room classes must survive
        assert set(np.unique(fixed.classes)) <= set(np.unique(raw.classes)) | {20}
