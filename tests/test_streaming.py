"""Device-resident streaming path (BASELINE config 4 production path)."""

import numpy as np
import jax.numpy as jnp

from fusion3dseg_tpu.io import rtab, synthetic
from fusion3dseg_tpu.models import SegFormerConfig
from fusion3dseg_tpu.pipeline.get2dseg import Segmenter2D
from fusion3dseg_tpu.pipeline.streaming import stream_segment

TINY = SegFormerConfig(
    num_classes=134, embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
    num_heads=(1, 2, 3, 4), decoder_dim=32, dtype=jnp.float32,
)


def _setup(F=5, hw=(48, 36)):
    sess = synthetic.make_session(nframes=F, depth_hw=hw)
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    rng = np.random.default_rng(0)
    npts = 500
    # per-frame INJECTIVE pixel->point maps (a real z-buffer uv2pt lets a
    # point win at most one pixel per frame)
    P = hw[0] * hw[1]
    uv2pt = np.full((F, P), -1, np.int32)
    for f in range(F):
        pix = rng.choice(P, size=npts, replace=False)
        uv2pt[f, pix] = rng.permutation(npts)
    return sd, uv2pt, npts


class TestStreamSegment:
    def test_contract_and_determinism(self):
        sd, uv2pt, npts = _setup()
        seg = Segmenter2D(config=TINY, input_hw=(64, 64), batch_size=2)
        votes, classes = stream_segment(
            sd, seg, uv2pt, npts=npts, nclasses=133, batch_size=2,
            conf_threshold=0.0,
        )
        assert votes.shape == (npts, 134) and classes.shape == (npts,)
        # dedup voting: at most one vote per (point, frame)
        assert votes.sum(axis=1).max() <= sd.nframes
        assert classes.max() <= 133
        v2, c2 = stream_segment(
            sd, seg, uv2pt, npts=npts, nclasses=133, batch_size=2,
            conf_threshold=0.0,
        )
        np.testing.assert_array_equal(votes, v2)
        np.testing.assert_array_equal(classes, c2)

    def test_confidence_rule_all_unclassified(self):
        """conf_threshold > 1 -> every pixel votes class 133 (the
        reference's get2DSeg.py:113-118 rule, applied on device)."""
        sd, uv2pt, npts = _setup()
        seg = Segmenter2D(config=TINY, input_hw=(64, 64), batch_size=2)
        votes, classes = stream_segment(
            sd, seg, uv2pt, npts=npts, nclasses=133, batch_size=2,
            conf_threshold=1.1,
        )
        voted = votes.sum(axis=1) > 0
        assert voted.any()
        # only the unclassified column receives votes
        assert votes[:, :133].sum() == 0
        assert (classes[voted] == 133).all()

    def test_matches_mask_file_path(self, tmp_path):
        """The streamed device path and the mask-file path (SegmentImage ->
        vote_session -> classify) must agree on almost every point — this
        pins the semantic equivalence of the two production paths (the
        resize happens at a different stage in each, so boundary pixels may
        differ; re-added after the r3 stream_segment restructure)."""
        from fusion3dseg_tpu.ops import voting as vops
        from fusion3dseg_tpu.pipeline.get2dseg import SegmentImage
        from fusion3dseg_tpu.pipeline import get3dseg

        sess = synthetic.make_session(nframes=6, depth_hw=(48, 36))
        out = tmp_path / "sess"
        synthetic.write_session_dir(sess, out, write_masks=False)
        # BOTH paths must consume identical pixels: read the jpgs back
        sd = rtab.SessionData.from_export_dir(out)

        rng = np.random.default_rng(1)
        npts, P = 500, 48 * 36
        uv2pt = np.full((6, P), -1, np.int32)
        for f in range(6):
            pix = rng.choice(P, size=npts, replace=False)
            uv2pt[f, pix] = rng.permutation(npts)
        uvdir = tmp_path / "work" / "fusion" / "uv2pt"
        uvdir.mkdir(parents=True)
        for f in range(6):
            np.save(uvdir / f"{f}.npy", uv2pt[f])

        seg = Segmenter2D(config=TINY, input_hw=(64, 64), batch_size=2)

        # path A: masks written to files, voted from files
        SegmentImage(str(out / "rgb"), str(tmp_path / "masks"),
                     segmenter=seg, conf_threshold=0.017)
        votes_a = get3dseg.vote_session(
            tmp_path / "work", tmp_path / "masks", npts, (48, 36), 133
        )
        classes_a = np.asarray(
            vops.classify(jnp.asarray(votes_a), 0.5, 133, None))

        # path B: streamed device-resident
        votes_b, classes_b = stream_segment(
            sd, seg, uv2pt, npts=npts, nclasses=133,
            conf_threshold=0.017, batch_size=2,
        )
        agree = (classes_a == classes_b).mean()
        assert agree > 0.9, agree
