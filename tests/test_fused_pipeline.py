"""fuse_session_and_vote must be bit-identical to the two-call sequence.

The fused program exists purely to cut dispatch round-trips on the
tunnel platform (docs/ROUND4.md e2e floor) — any numeric divergence from
fuse_session -> vote_and_classify is a bug.
"""
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.fusion import fuse_session, fuse_session_and_vote
from fusion3dseg_tpu.io import rtab, synthetic
from fusion3dseg_tpu.ops import voting

KW = dict(height=48, width=36, radius=0.1,
          min_cosine=0.9, max_depth=8.0, capacity=1 << 13)
NCLASSES = 133


def _session(seed, F=6, hw=(48, 36)):
    sess = synthetic.make_session(
        nframes=F, depth_hw=hw, room=synthetic.RoomSpec(seed=seed)
    )
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
    args = tuple(jnp.asarray(x) for x in (
        sd.Ks.astype(np.float32), sd.quats_wxyz, sd.translations,
        sd.points, sd.normals, sd.colors, valid,
    ))
    masks = jnp.asarray(sess.gt_mask.reshape(F, -1))
    return args, masks


class TestFusedPipeline:
    def test_matches_two_call_sequence(self):
        args, masks = _session(11)
        st_ref, uv_ref = fuse_session(*args, **KW)
        votes_ref, cls_ref = voting.vote_and_classify(
            uv_ref, masks, KW["capacity"], NCLASSES, threshold=0.5
        )
        st, uv, votes, cls = fuse_session_and_vote(
            *args, masks, nclasses=NCLASSES, threshold=0.5, **KW
        )
        assert int(st.n) == int(st_ref.n)
        np.testing.assert_array_equal(np.asarray(uv), np.asarray(uv_ref))
        np.testing.assert_array_equal(np.asarray(votes), np.asarray(votes_ref))
        assert cls.dtype == jnp.uint8  # 133-class taxonomy fits u8
        np.testing.assert_array_equal(
            np.asarray(cls).astype(np.int32), np.asarray(cls_ref)
        )
        for f_ref, f in zip(st_ref, st):
            np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f))

    def test_windowed_and_filtered(self):
        """Window + filter_classes + dedup=False flow through unchanged."""
        args, masks = _session(12, F=5)
        kw = dict(KW, window=1 << 9, window_policy="split")
        st_ref, uv_ref = fuse_session(*args, **kw)
        votes_ref, cls_ref = voting.vote_and_classify(
            uv_ref, masks, KW["capacity"], NCLASSES,
            threshold=0.4, filter_classes=(0, 2, 5), dedup=False,
        )
        st, uv, votes, cls = fuse_session_and_vote(
            *args, masks, nclasses=NCLASSES, threshold=0.4,
            filter_classes=(0, 2, 5), dedup=False, **kw
        )
        assert int(st.n) == int(st_ref.n)
        np.testing.assert_array_equal(np.asarray(votes), np.asarray(votes_ref))
        np.testing.assert_array_equal(
            np.asarray(cls).astype(np.int32), np.asarray(cls_ref)
        )

    def test_wide_taxonomy_keeps_int32(self):
        args, masks = _session(13, F=3)
        _, _, _, cls = fuse_session_and_vote(
            *args, masks, nclasses=300, threshold=0.5, **KW
        )
        assert cls.dtype == jnp.int32
