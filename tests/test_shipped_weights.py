"""Shipped 2D weights: a fresh clone must segment sensibly out of the box.

VERDICT r2 #8: checkpoints/ used to be fully gitignored, so SegmentImage on
a fresh clone ran random weights. Now a compressed float16 B1 snapshot
(trained on textured shape-prior rooms, docs/ROUND2.md) ships in-repo and
this pins its quality: held-out mIoU on a fresh synthetic session must stay
above the bar (the full 8-session eval measured 0.8165; a 1-session subset
bar of 0.70 absorbs per-room variance while still failing for any broken /
random / truncated snapshot, whose mIoU is ~0.01).
"""

import numpy as np
import pytest

from fusion3dseg_tpu.pipeline.get2dseg import (
    Segmenter2D, load_params_npz, save_params_npz, shipped_checkpoint,
)


class TestNpzSnapshot:
    def test_roundtrip_small_tree(self, tmp_path):
        params = {
            "layer": {"kernel": np.random.default_rng(0).random((4, 4)).astype(np.float32),
                      "step": np.asarray(7, np.int32)},
            "head": {"bias": np.zeros(3, np.float32)},
        }
        p = tmp_path / "w.npz"
        save_params_npz(p, params)
        rt = load_params_npz(p)
        assert set(rt) == {"layer", "head"}
        assert rt["layer"]["step"] == 7 and rt["layer"]["step"].dtype == np.int32
        assert rt["layer"]["kernel"].dtype == np.float32
        np.testing.assert_allclose(
            rt["layer"]["kernel"], params["layer"]["kernel"], atol=1e-3
        )


@pytest.mark.skipif(shipped_checkpoint("b1") is None,
                    reason="shipped checkpoint not present")
class TestShippedB1:
    def test_heldout_miou_bar(self):
        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.models.train import evaluate_synthetic

        seg = Segmenter2D(
            config=SegFormerConfig.named("b1"),
            checkpoint_dir=shipped_checkpoint("b1"),
            input_hw=(256, 256), batch_size=4,
        )
        stats = evaluate_synthetic(
            seg, nsessions=1, nframes=4, appearance="textured"
        )
        assert stats["pixel_acc"] >= 0.95, stats
        assert stats["miou"] >= 0.70, stats

    def test_degraded_sensor_miou_bar(self):
        """VERDICT r2 #4: the model composed with the Kinect degradation
        model. Measured (docs/ROUND3.md): clean mIoU 0.825 -> 0.815 under
        rgb noise 12 / full degradation — the robustness must not regress
        below the bar."""
        from fusion3dseg_tpu.io import synthetic
        from fusion3dseg_tpu.models import SegFormerConfig

        seg = Segmenter2D(
            config=SegFormerConfig.named("b1"),
            checkpoint_dir=shipped_checkpoint("b1"),
            input_hw=(256, 256), batch_size=4,
        )
        num_classes = 134
        inter = np.zeros(num_classes)
        union = np.zeros(num_classes)
        correct = total = 0
        sess = synthetic.make_session(
            nframes=4, depth_hw=(96, 72),
            room=synthetic.RoomSpec(seed=990_100), appearance="textured",
        )
        sess = synthetic.degrade_session(
            sess, seed=0, rgb_noise=8.0, hole_fraction=0.03,
            pose_drift=0.002,
        )
        gts = sess.gt_mask.astype(np.int64)
        preds = seg.predict_batch(sess.colors).astype(np.int64)
        for c in range(num_classes):
            p, g = preds == c, gts == c
            inter[c] += (p & g).sum()
            union[c] += (p | g).sum()
        correct += (preds == gts).sum()
        total += gts.size
        present = union > 0
        miou = float((inter[present] / union[present]).mean())
        acc = float(correct / total)
        assert acc >= 0.95, (miou, acc)
        assert miou >= 0.65, (miou, acc)


@pytest.mark.skipif(shipped_checkpoint("b2") is None,
                    reason="shipped b2 checkpoint not present")
class TestShippedB2:
    """r4 (VERDICT r3 next#2): B2 is now the shipped accuracy default.
    The shipped snapshot is the boundary-weighted EMA fine-tune (8000
    further steps at aug-strength 1.5, docs/ROUND4.md): full 8-session
    eval mIoU 0.8857, converted npz re-measured 0.9889 on the 1-session
    harness subset — the bar below absorbs per-room variance while
    failing for any broken snapshot or regression to the pre-fine-tune
    weights (subset 0.956)."""

    def test_heldout_miou_bar(self):
        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.models.train import evaluate_synthetic

        seg = Segmenter2D(
            config=SegFormerConfig.named("b2"),
            checkpoint_dir=shipped_checkpoint("b2"),
            input_hw=(256, 256), batch_size=4,
        )
        stats = evaluate_synthetic(
            seg, nsessions=1, nframes=4, appearance="textured"
        )
        assert stats["pixel_acc"] >= 0.95, stats
        # between the pre-fine-tune snapshot's 0.956 and the shipped
        # 0.9889, so a silent revert to the old weights FAILS (review r4)
        assert stats["miou"] >= 0.97, stats

    def test_best_shipped_prefers_b2(self):
        from fusion3dseg_tpu.pipeline.get2dseg import best_shipped_checkpoint

        name, path = best_shipped_checkpoint()
        assert name == "b2" and path == shipped_checkpoint("b2")
