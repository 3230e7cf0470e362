"""Multi-session vmapped fusion, state checkpointing, SegmentImage e2e."""

import numpy as np
import jax.numpy as jnp
import pytest

from fusion3dseg_tpu.fusion import (
    fuse_session, fuse_sessions_batch, load_state, save_state,
)
from fusion3dseg_tpu.io import rtab, synthetic


def _session_arrays(seed, F=6, hw=(48, 36)):
    sess = synthetic.make_session(
        nframes=F, depth_hw=hw, room=synthetic.RoomSpec(seed=seed)
    )
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
    return (
        sd.Ks.astype(np.float32), sd.quats_wxyz, sd.translations,
        sd.points, sd.normals, sd.colors, valid,
    )


KW = dict(height=48, width=36, radius=0.1,
          min_cosine=0.9, max_depth=8.0, capacity=1 << 13)


class TestMultiSession:
    def test_batch_matches_individual(self):
        a = _session_arrays(1)
        b = _session_arrays(2)
        batched = tuple(
            jnp.stack([jnp.asarray(x), jnp.asarray(y)]) for x, y in zip(a, b)
        )
        state_b, uv_b = fuse_sessions_batch(*batched, **KW)
        for s, args in enumerate((a, b)):
            state_1, uv_1 = fuse_session(*(jnp.asarray(x) for x in args), **KW)
            np.testing.assert_array_equal(np.asarray(uv_b)[s], np.asarray(uv_1))
            assert int(state_b.n[s]) == int(state_1.n)
            n = int(state_1.n)
            np.testing.assert_allclose(
                np.asarray(state_b.points)[s][:n], np.asarray(state_1.points)[:n],
                atol=1e-6,
            )

    def test_state_checkpoint_roundtrip(self, tmp_path):
        args = _session_arrays(3)
        state, _ = fuse_session(*(jnp.asarray(x) for x in args), **KW)
        save_state(state, tmp_path)
        restored = load_state(tmp_path)
        np.testing.assert_array_equal(np.asarray(state.points), np.asarray(restored.points))
        assert int(state.n) == int(restored.n)

    def test_midscan_checkpoint_resume_bitexact(self, tmp_path):
        """A half-fused session resumed from its mid-scan checkpoint must
        reproduce the one-shot scan bit-exactly (VERDICT r1 #10)."""
        from fusion3dseg_tpu.fusion import fuse_session_checkpointed

        args = _session_arrays(4, F=9)
        # one-shot reference
        state_ref, uv_ref = fuse_session(*(jnp.asarray(x) for x in args), **KW)
        # interrupted run: seed + 2 chunks of 3 frames, then stop
        st_half, uv_half = fuse_session_checkpointed(
            *args, chunk_frames=3, ckpt_dir=tmp_path, max_chunks=2, **KW
        )
        assert uv_half.shape[0] == 7  # seed + 2*3 frames fused so far
        # resume in a FRESH call (simulates a new process)
        st, uv = fuse_session_checkpointed(
            *args, chunk_frames=3, ckpt_dir=tmp_path, **KW
        )
        np.testing.assert_array_equal(uv, np.asarray(uv_ref))
        assert int(st.n) == int(state_ref.n)
        np.testing.assert_array_equal(
            np.asarray(st.points), np.asarray(state_ref.points)
        )
        np.testing.assert_array_equal(
            np.asarray(st.nmerges), np.asarray(state_ref.nmerges)
        )

    def test_checkpoint_crash_between_state_and_marker(self, tmp_path):
        """Commit protocol: a crash AFTER the next chunk's state lands but
        BEFORE the marker names it must leave the run resumable from the
        previous commit — re-fusing the interrupted chunk exactly once,
        not re-applying a committed chunk (review finding r2)."""
        from fusion3dseg_tpu.fusion import fuse_session_checkpointed
        from fusion3dseg_tpu.fusion.fusion import save_state, _empty_state

        args = _session_arrays(4, F=9)
        state_ref, uv_ref = fuse_session(*(jnp.asarray(x) for x in args), **KW)
        fuse_session_checkpointed(
            *args, chunk_frames=3, ckpt_dir=tmp_path, max_chunks=1, **KW
        )
        # simulate the torn commit: an orphan state dir from a crashed
        # chunk (bogus contents), marker still naming the committed one
        save_state(_empty_state(KW["capacity"]), tmp_path / "state_0009999")
        st, uv = fuse_session_checkpointed(
            *args, chunk_frames=3, ckpt_dir=tmp_path, **KW
        )
        np.testing.assert_array_equal(uv, np.asarray(uv_ref))
        np.testing.assert_array_equal(
            np.asarray(st.points), np.asarray(state_ref.points)
        )
        np.testing.assert_array_equal(
            np.asarray(st.nmerges), np.asarray(state_ref.nmerges)
        )
        # the orphan was pruned at the next commit
        assert not (tmp_path / "state_0009999").exists()

    def test_windowed_fusion_matches_full(self):
        """window >= the visible-slot span must reproduce the full merge
        (ROADMAP #10 buffer windowing)."""
        from fusion3dseg_tpu.fusion.fusion import (
            fuse_session, visible_span_from_uv2pt,
        )

        args = _session_arrays(6, F=8)
        kw = dict(KW, capacity=1 << 15)
        st_full, uv_full = fuse_session(*(jnp.asarray(x) for x in args), **kw)
        span_max = int(visible_span_from_uv2pt(uv_full).max())
        w = 1 << max(span_max, 2).bit_length()  # next pow2 above the span
        st_w, uv_w = fuse_session(
            *(jnp.asarray(x) for x in args), window=w, **kw
        )
        assert int(st_w.n) == int(st_full.n)
        agree = np.mean(np.asarray(uv_w) == np.asarray(uv_full))
        assert agree >= 0.99, agree

    def test_windowed_fusion_small_window_degrades_gracefully(self):
        from fusion3dseg_tpu.fusion.fusion import fuse_session

        args = _session_arrays(7, F=8)
        kw = dict(KW, capacity=1 << 15)
        st_full, _ = fuse_session(*(jnp.asarray(x) for x in args), **kw)
        st_w, uv_w = fuse_session(
            *(jnp.asarray(x) for x in args), window=256, **kw
        )
        # missed merges re-append: more points, never fewer; uv2pt stays valid
        assert int(st_w.n) >= int(st_full.n)
        uv = np.asarray(uv_w)
        assert uv.max() < (1 << 15) and uv.min() >= -1

    def test_midscan_checkpoint_session_mismatch(self, tmp_path):
        from fusion3dseg_tpu.fusion import fuse_session_checkpointed

        args = _session_arrays(5, F=6)
        fuse_session_checkpointed(
            *args, chunk_frames=4, ckpt_dir=tmp_path, max_chunks=1, **KW
        )
        other = _session_arrays(5, F=8)
        with pytest.raises(ValueError, match="different session"):
            fuse_session_checkpointed(
                *other, chunk_frames=4, ckpt_dir=tmp_path, **KW
            )

    def test_midscan_checkpoint_parameter_mismatch(self, tmp_path):
        """Resuming under ANY changed fusion parameter must be rejected —
        silently continuing from state fused under the old radius/window
        would break bit-exactness (review finding r2)."""
        from fusion3dseg_tpu.fusion import fuse_session_checkpointed

        args = _session_arrays(5, F=6)
        fuse_session_checkpointed(
            *args, chunk_frames=4, ckpt_dir=tmp_path, max_chunks=1, **KW
        )
        for change in (dict(radius=0.2), dict(min_cosine=0.5),
                       dict(max_depth=4.0)):
            with pytest.raises(ValueError, match="parameterization"):
                fuse_session_checkpointed(
                    *args, chunk_frames=4, ckpt_dir=tmp_path,
                    **dict(KW, **change),
                )
        with pytest.raises(ValueError, match="parameterization"):
            fuse_session_checkpointed(
                *args, chunk_frames=4, ckpt_dir=tmp_path, window=512, **KW
            )

    def test_checkpointed_retry_recovers_bit_exact(self, tmp_path, monkeypatch):
        """retries= re-runs a failed chunk from its committed predecessor
        state; a transient mid-scan failure must leave the final result
        bit-equal to an undisturbed run (elastic recovery, SURVEY §5)."""
        from fusion3dseg_tpu.fusion import fusion as fmod

        args = _session_arrays(6, F=9)
        ref_state, ref_uv = fmod.fuse_session_checkpointed(
            *args, chunk_frames=3, ckpt_dir=tmp_path / "ref", **KW
        )

        real = fmod.fuse_chunk
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 2:  # fail the SECOND chunk once
                raise RuntimeError("injected transient backend error")
            return real(*a, **k)

        monkeypatch.setattr(fmod, "fuse_chunk", flaky)
        got_state, got_uv = fmod.fuse_session_checkpointed(
            *args, chunk_frames=3, ckpt_dir=tmp_path / "flaky", retries=1,
            **KW
        )
        assert calls["n"] == 4  # 3 chunks + 1 retry
        np.testing.assert_array_equal(np.asarray(ref_uv), np.asarray(got_uv))
        for fld in ref_state._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(ref_state, fld)),
                np.asarray(getattr(got_state, fld)), err_msg=fld)
        # without retries the same failure must propagate
        calls["n"] = 0
        with pytest.raises(RuntimeError, match="injected"):
            fmod.fuse_session_checkpointed(
                *args, chunk_frames=3, ckpt_dir=tmp_path / "noretry", **KW
            )

    def test_packed_key_sparsify_bit_identical(self):
        """voxel_merge's packed single-key sort (static extent bound) must
        reproduce the 3-key lexicographic sort bit-exactly: same cell
        numbering, same means, same per-row cell map — including secondary
        normal-cone splits and invalid rows — and must silently fall back
        when the bound does not fit 31 packed bits."""
        from fusion3dseg_tpu.ops.sparsify import voxel_merge

        rng = np.random.default_rng(7)
        N = 4096
        pts = rng.uniform(-4.0, 4.0, size=(N, 3)).astype(np.float32)
        nrm = rng.normal(size=(N, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        # cluster many points so voxels are multi-member and normal
        # disagreement triggers secondary cells
        pts[: N // 2] = pts[rng.integers(N // 2, N, size=N // 2)]
        clr = rng.random((N, 3)).astype(np.float32)
        w = rng.integers(1, 5, size=N).astype(np.int32)
        occ = rng.integers(1, 9, size=N).astype(np.int32)
        valid = rng.random(N) > 0.2
        valid[0] = True  # the outlier row below must be dropped, not masked
        args = tuple(jnp.asarray(x) for x in (pts, nrm, clr, w, occ, valid))

        ref = voxel_merge(*args, 0.1, 0.9, extent_cells=None)
        for ext in (81, 1 << 7, 1 << 12):  # 1<<12 -> 36 bits -> fallback
            got = voxel_merge(*args, 0.1, 0.9, extent_cells=ext)
            for fld in ref._fields[:-1]:
                np.testing.assert_array_equal(
                    np.asarray(getattr(ref, fld)),
                    np.asarray(getattr(got, fld)), err_msg=f"{fld} @ {ext}")

        # out-of-contract valid point beyond the extent bound: DROPPED
        # (cell -1), never clamp-merged into boundary geometry
        pts2 = pts.copy()
        pts2[0] = [500.0, 0.0, 0.0]
        args2 = (jnp.asarray(pts2),) + args[1:]
        g2 = voxel_merge(*args2, 0.1, 0.9, extent_cells=81)
        assert int(np.asarray(g2.cell_of_input)[0]) == -1
        # every in-extent point still lands in a cell whose mean it joins
        live = np.asarray(g2.cell_of_input)[1:][np.asarray(valid)[1:]]
        assert (live >= 0).all()

        # a MIN-corner outlier corrupts the grid anchor; the recentre must
        # keep the in-contract bulk (and drop the outlier), not the inverse
        pts3 = pts.copy()
        pts3[0] = [-500.0, -500.0, -500.0]
        args3 = (jnp.asarray(pts3),) + args[1:]
        g3 = voxel_merge(*args3, 0.1, 0.9, extent_cells=81)
        assert int(np.asarray(g3.cell_of_input)[0]) == -1
        live3 = np.asarray(g3.cell_of_input)[1:][np.asarray(valid)[1:]]
        assert (live3 >= 0).all()

    def test_append_strategies_agree_and_drop_at_capacity(self):
        """_append_sparsified picks its strategy statically by capacity
        (scatter <= 2^18 < staged).  The two must write identical rows for
        the same update set, and the staged path's near-capacity cond
        fallback must preserve drop-at-capacity semantics exactly."""
        from fusion3dseg_tpu.fusion.fusion import (
            FusionState, _append_sparsified, _empty_state,
        )
        from fusion3dseg_tpu.ops.sparsify import SparsifyResult

        C = 64
        rng = np.random.default_rng(0)
        counts = rng.integers(0, 3, size=C).astype(np.int32)  # ~2/3 occupied
        sp = SparsifyResult(
            points=jnp.asarray(rng.normal(size=(C, 3)).astype(np.float32)),
            normals=jnp.asarray(rng.normal(size=(C, 3)).astype(np.float32)),
            colors=jnp.asarray(rng.random((C, 3)).astype(np.float32)),
            counts=jnp.asarray(counts),
            cell_of_pixel=jnp.zeros((4,), jnp.int32),
            num_cells=C,
        )
        total = int((counts > 0).sum())

        # same appends through both strategies -> identical written rows
        small, big = 1 << 18, 1 << 19  # scatter vs staged, both empty
        st_s, map_s = _append_sparsified(_empty_state(small), sp, small)
        st_b, map_b = _append_sparsified(_empty_state(big), sp, big)
        assert int(st_s.n) == int(st_b.n) == total
        for fld in ("points", "normals", "colors", "nmerges", "occurences"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_s, fld))[:total],
                np.asarray(getattr(st_b, fld))[:total])
        np.testing.assert_array_equal(np.asarray(map_s), np.asarray(map_b))

        # staged path with n + C crossing capacity: cond falls back to the
        # scatter append; first (capacity - n) occupied cells land, rest drop
        room = 5
        nearly = FusionState(*(
            jnp.asarray(x) for x in (
                np.zeros((big, 3), np.float32),) * 3 + (
                np.zeros((big,), np.int32),) * 2),
            n=jnp.int32(big - room))
        st_f, map_f = _append_sparsified(nearly, sp, big)
        assert int(st_f.n) == big  # clamped full, not overflowed
        kept = np.asarray(map_f) >= 0
        assert int(kept.sum()) == room
        occ_rank = np.cumsum(counts > 0) - 1
        expect_kept = (counts > 0) & (occ_rank < room)
        np.testing.assert_array_equal(kept, expect_kept)
        np.testing.assert_allclose(
            np.asarray(st_f.points)[big - room:],
            np.asarray(sp.points)[expect_kept], atol=0)

    def test_auto_window_heuristic(self):
        from fusion3dseg_tpu.fusion import auto_window

        # small capacity: full merge already fast, no window
        assert auto_window(12000, 1 << 17) is None
        # 1M capacity at benchmark-like seed density -> the hand-tuned 2^17
        assert auto_window(13000, 1 << 20) == 1 << 17
        # estimate at/above capacity degenerates to unwindowed
        assert auto_window(200000, 1 << 20) is None
        # floor
        assert auto_window(1, 1 << 19) == 1 << 13

    def test_fusion_driver_auto_window(self):
        """Fusion(capacity=big) picks a window automatically (VERDICT r2
        #5) and the result stays consistent with an explicit window."""
        from fusion3dseg_tpu.fusion import Fusion

        sess = synthetic.make_session(nframes=6, depth_hw=(48, 36))
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        f_auto = Fusion(sd, point_range=(0.1, 8.0), capacity=1 << 19)
        pts_a, *_ = f_auto.fuse(radius=0.1, angle=20, max_depth=8.0)
        # the auto path must produce a valid cloud and pick SOME window
        # decision without error (tiny session -> estimate is small)
        assert len(pts_a) > 0
        f_none = Fusion(sd, point_range=(0.1, 8.0), capacity=1 << 19,
                        window=None)
        pts_n, *_ = f_none.fuse(radius=0.1, angle=20, max_depth=8.0)
        # windowed merge may re-append a few slots but stays close
        assert 0.9 * len(pts_n) <= len(pts_a) <= 1.5 * len(pts_n)


class TestSegmentImageE2E:
    def test_masks_and_viz_written(self, tmp_path):
        import cv2

        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.pipeline.get2dseg import SegmentImage, Segmenter2D

        rgb = tmp_path / "rgb"
        masks = tmp_path / "masks"
        rgb.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            cv2.imwrite(str(rgb / f"{i}.jpg"),
                        (rng.random((40, 32, 3)) * 255).astype(np.uint8))

        tiny = SegFormerConfig(
            num_classes=134, embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
            num_heads=(1, 2, 3, 4), decoder_dim=32, dtype=jnp.float32,
        )
        seg = Segmenter2D(config=tiny, input_hw=(64, 64))
        SegmentImage(str(rgb), str(masks), segmenter=seg, batch_size=2)
        outs = sorted(masks.glob("*.png"))
        assert len(outs) == 3
        m = cv2.imread(str(outs[0]), 0)
        assert m.shape == (40, 32) and m.max() <= 133
        assert len(list((masks / "viz").glob("*.png"))) == 3

    def test_filter_classes_skips_frames(self, tmp_path):
        import cv2

        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.pipeline.get2dseg import SegmentImage, Segmenter2D

        rgb = tmp_path / "rgb"
        masks = tmp_path / "masks"
        rgb.mkdir()
        cv2.imwrite(str(rgb / "0.jpg"), np.zeros((32, 32, 3), np.uint8))
        tiny = SegFormerConfig(
            num_classes=134, embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
            num_heads=(1, 2, 3, 4), decoder_dim=32, dtype=jnp.float32,
        )
        seg = Segmenter2D(config=tiny, input_hw=(64, 64))
        # conf_threshold > 1 -> everything class 133 -> no frame contains 5
        SegmentImage(str(rgb), str(masks), conf_threshold=1.1,
                     filter_classes=[5], segmenter=seg)
        assert len(list(masks.glob("*.png"))) == 0

    def test_auto_capacity_and_min_occ_remap(self, tmp_path):
        from fusion3dseg_tpu.pipeline import process3d

        sess = synthetic.make_session(nframes=10, depth_hw=(48, 36))
        out = tmp_path / "sess"
        synthetic.write_session_dir(sess, out)
        work = tmp_path / "work"
        pts, *_ = process3d.process3DSeg(
            out, work, radius=0.1, stride=6, point_range=(0.1, 8.0),
            capacity=None,  # auto-size
            min_occ=3, apply_min_occ=True,
        )
        n = len(pts)
        assert n > 0
        # every uv2pt artifact was remapped into the filtered index space
        for f in (work / "fusion" / "uv2pt").glob("*.npy"):
            uv = np.load(f)
            assert uv.max() < n
            assert uv.min() >= -1
        # and the dumped cloud only holds points with nmerges >= 3
        from fusion3dseg_tpu.io import artifacts

        _, _, _, nmerges, _, _, _, _ = artifacts.load_fusion_data(work)
        assert (np.asarray(nmerges) >= 3).all()

    def test_capacity_saturation_warns(self):
        import warnings as w

        from fusion3dseg_tpu.fusion import Fusion

        sess = synthetic.make_session(nframes=4, depth_hw=(48, 36))
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        f = Fusion(sd, point_range=(0.1, 8.0), capacity=64)  # absurdly small
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            f.fuse(radius=0.1, angle=20, stride=6, max_depth=8.0)
        assert any("saturated" in str(c.message) for c in caught)

    def test_vote_session_no_masks_clear_error(self, tmp_path):
        from fusion3dseg_tpu.pipeline import get3dseg

        (tmp_path / "fusion" / "uv2pt").mkdir(parents=True)
        empty_masks = tmp_path / "masks"
        empty_masks.mkdir()
        with pytest.raises(FileNotFoundError, match="stem matches"):
            get3dseg.vote_session(tmp_path, empty_masks, 10, (4, 4), 10)

    def test_checkpoint_save_restore_via_segmenter(self, tmp_path):
        import jax.numpy as jnp

        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.pipeline.get2dseg import Segmenter2D, save_checkpoint

        tiny = SegFormerConfig(
            num_classes=134, embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
            num_heads=(1, 2, 3, 4), decoder_dim=32, dtype=jnp.float32,
        )
        seg1 = Segmenter2D(config=tiny, input_hw=(64, 64))
        save_checkpoint(tmp_path / "ckpt", seg1.params)
        seg2 = Segmenter2D(config=tiny, checkpoint_dir=tmp_path / "ckpt",
                           input_hw=(64, 64))
        img = (np.random.default_rng(0).random((1, 64, 64, 3)) * 255).astype(np.uint8)
        np.testing.assert_array_equal(
            seg1.predict_batch(img, 0.0), seg2.predict_batch(img, 0.0)
        )

    def test_default_calibration_fallback(self, tmp_path):
        sess = synthetic.make_session(nframes=3, depth_hw=(32, 24))
        synthetic.write_session_dir(sess, tmp_path)
        (tmp_path / "calibration.yaml").unlink()
        sd = rtab.SessionData.from_export_dir(tmp_path)
        # packaged default intrinsics (reference fx ~ 798.94)
        assert abs(sd.K[0, 0] - 798.94) < 1e-6


class TestLoopClosureWindow:
    """Windowed-merge behavior at loop closure (VERDICT r3 weak#4/next#4).

    A revisit trajectory (orbit turns=2) makes old slots visible together
    with fresh ones: the visible span exceeds any window smaller than the
    buffer, so the "newest"-preferring window misses merges against the
    original geometry and re-appends duplicates. The "split" policy keeps
    half the window on the OLDEST visible slots; measured on this session
    (CPU, bit-exact engine): newest +94.3% appended points, split -0.02%.
    """

    def _fuse(self, sess, window, policy):
        import jax.numpy as jnp

        from fusion3dseg_tpu.fusion import fusion as fe
        from fusion3dseg_tpu.io import rtab

        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        state, uv = fe.fuse_session(
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            jnp.asarray(valid),
            height=48, width=36, radius=0.08,
            min_cosine=float(np.cos(np.deg2rad(20.0))), max_depth=8.0,
            capacity=1 << 15, window=window, window_policy=policy,
        )
        return int(state.n)

    def test_split_window_kills_revisit_duplicates(self):
        sess = synthetic.make_session(
            nframes=32, depth_hw=(48, 36), turns=2.0
        )
        n_full = self._fuse(sess, None, "newest")  # unwindowed ground truth
        W = 1 << 13  # >= per-frame span, < the revisit span
        n_newest = self._fuse(sess, W, "newest")
        n_split = self._fuse(sess, W, "split")
        dup_newest = (n_newest - n_full) / n_full
        dup_split = abs(n_split - n_full) / n_full
        # measured: +94.3% vs -0.016%; generous bars so tie-break-level
        # engine changes don't flap the test
        assert dup_newest > 0.30, dup_newest  # the failure mode is REAL
        assert dup_split < 0.02, dup_split    # and split removes it


class TestOverflowTelemetryAndDedup:
    """Window-overflow telemetry + the post-scan dedup repair (VERDICT r4
    #2): fuse_session(with_stats=True) reports each frame's visible slot
    span, and dedup_state merges the duplicates an overflowed window
    appended, bringing the windowed result back to the full merge's
    point count at default knobs."""

    RADIUS = 0.08
    MC = float(np.cos(np.deg2rad(20.0)))

    def _fuse(self, sess, window, policy, with_stats=False, cap=1 << 15):
        import jax.numpy as jnp

        from fusion3dseg_tpu.fusion import fusion as fe
        from fusion3dseg_tpu.io import rtab

        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        return fe.fuse_session(
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            jnp.asarray(valid),
            height=48, width=36, radius=self.RADIUS,
            min_cosine=self.MC, max_depth=8.0,
            capacity=cap, window=window, window_policy=policy,
            with_stats=with_stats,
        )

    def test_with_stats_spans(self):
        sess = synthetic.make_session(
            nframes=16, depth_hw=(48, 36), turns=2.0
        )
        W = 1 << 12
        state, uv2pt, spans = self._fuse(sess, W, "newest", with_stats=True)
        spans = np.asarray(spans)
        assert spans.shape == (16,)
        assert spans[0] == 0  # seed frame carries no span
        assert (spans[1:] > 0).all()
        # the revisit orbit makes old+new slots visible together: the
        # engine must REPORT the overflow
        assert spans.max() > W
        # the unwindowed run reports spans too (diagnostics for window
        # sizing); its buffer evolves without duplicates so values can
        # differ from the windowed run's, but the seed convention holds
        _, _, spans_full = self._fuse(sess, None, "newest", with_stats=True)
        spans_full = np.asarray(spans_full)
        assert spans_full.shape == (16,) and spans_full[0] == 0
        # stats variant returns the same fusion result
        state2, uv2pt2 = self._fuse(sess, W, "newest")
        assert int(state.n) == int(state2.n)
        np.testing.assert_array_equal(np.asarray(uv2pt), np.asarray(uv2pt2))

    def test_dedup_repairs_window_overflow(self):
        import jax.numpy as jnp

        from fusion3dseg_tpu.fusion import fusion as fe

        sess = synthetic.make_session(
            nframes=32, depth_hw=(48, 36), turns=2.0
        )
        cap = 1 << 15
        st_full, _, _ = self._fuse(sess, None, "newest", with_stats=True)
        n_full = int(st_full.n)
        W = 1 << 13
        st_w, uv_w, spans = self._fuse(sess, W, "newest", with_stats=True)
        n_w = int(st_w.n)
        assert np.asarray(spans).max() > W  # overflow happened
        assert (n_w - n_full) / n_full > 0.30  # and duplicated points
        st_d, slot_map = fe.dedup_state(
            st_w, self.RADIUS, self.MC, capacity=cap
        )
        n_d = int(st_d.n)
        # the repair removes the windowing duplicates entirely: vs the
        # RAW full merge it lands at or below (the full merge itself
        # keeps sub-radius cross-frame pairs the voxel criterion merges,
        # so dedup normalizes both) ...
        assert n_d <= n_full * 1.02, (n_d, n_full)
        # ... and vs the full merge under the SAME normalization the gap
        # is within 2% — the windowed+dedup'd cloud is the full+dedup'd
        # cloud up to grid re-binning
        st_fd, _ = fe.dedup_state(st_full, self.RADIUS, self.MC, capacity=cap)
        n_fd = int(st_fd.n)
        assert abs(n_d - n_fd) / n_fd < 0.02, (n_d, n_fd)
        # no geometry lost: every full-merge point has a deduped-windowed
        # point within the voxel-merge distance bound
        from scipy.spatial import cKDTree

        dist, _ = cKDTree(np.asarray(st_d.points)[:n_d]).query(
            np.asarray(st_full.points)[:n_full]
        )
        assert dist.max() <= np.sqrt(3) * self.RADIUS * 1.01, dist.max()
        smap = np.asarray(slot_map)
        # live slots map into the compacted prefix, dead slots to -1
        assert (smap[:n_w] >= 0).all() and (smap[:n_w] < n_d).all()
        assert (smap[n_w:] == -1).all()
        # weights (merge multiplicity) and occurrences are conserved
        assert int(np.asarray(st_d.nmerges).sum()) == int(
            np.asarray(st_w.nmerges).sum()
        )
        assert int(np.asarray(st_d.occurences).sum()) == int(
            np.asarray(st_w.occurences).sum()
        )
        # each old point lands within the voxel-merge distance bound of
        # its merged representative
        old = np.asarray(st_w.points)[:n_w]
        new = np.asarray(st_d.points)[smap[:n_w]]
        d = np.linalg.norm(old - new, axis=1)
        assert d.max() <= np.sqrt(3) * self.RADIUS * 1.01, d.max()
        # order preservation: first-occurrence order of new ids along the
        # old buffer is monotone (merged points keep their earliest
        # constituent's position)
        first = {}
        for old_id, new_id in enumerate(smap[:n_w]):
            first.setdefault(int(new_id), old_id)
        orders = [first[k] for k in sorted(first)]
        assert orders == sorted(orders)
        # uv2pt remap: every previously matched pixel still points at a
        # live slot
        uv_r = np.asarray(fe.remap_uv2pt(uv_w, slot_map))
        uv_w = np.asarray(uv_w)
        assert ((uv_r >= 0) == (uv_w >= 0)).all()
        assert uv_r.max() < n_d

    def test_dedup_merges_into_earliest_slot(self):
        import jax.numpy as jnp

        from fusion3dseg_tpu.fusion import fusion as fe

        cap = 64
        rng = np.random.default_rng(0)
        base = rng.uniform(-2, 2, (10, 3)).astype(np.float32)
        dups = base[:6] + rng.uniform(-0.01, 0.01, (6, 3)).astype(np.float32)
        pts = np.zeros((cap, 3), np.float32)
        pts[:10], pts[10:16] = base, dups
        nrm = np.zeros((cap, 3), np.float32)
        nrm[:16] = [0.0, 0.0, 1.0]
        clr = np.zeros((cap, 3), np.float32)
        nm = np.zeros(cap, np.int32)
        nm[:16] = rng.integers(1, 5, 16)
        occ = np.zeros(cap, np.int32)
        occ[:16] = 1
        st = fe.FusionState(
            *map(jnp.asarray, (pts, nrm, clr, nm, occ)), jnp.int32(16)
        )
        st2, smap = fe.dedup_state(st, 0.05, self.MC, capacity=cap)
        smap = np.asarray(smap)
        # bases keep their ids 0..9 (well separated); each dup folds into
        # its base's slot — weighted means stay exact
        assert int(st2.n) == 10
        np.testing.assert_array_equal(smap[:10], np.arange(10))
        np.testing.assert_array_equal(smap[10:16], np.arange(6))
        assert (smap[16:] == -1).all()
        w = nm[:16].astype(np.float64)
        for b in range(6):
            exp = (pts[b] * w[b] + pts[10 + b] * w[10 + b]) / (
                w[b] + w[10 + b]
            )
            np.testing.assert_allclose(
                np.asarray(st2.points)[b], exp, atol=1e-6
            )


class TestCheckpointPolicyPin:
    def test_resume_with_changed_window_policy_refuses(self, tmp_path):
        """window_policy is scan math: resuming a checkpoint fused under a
        different overflow policy must refuse, not silently continue."""
        import pytest

        from fusion3dseg_tpu.fusion import fuse_session_checkpointed

        args = _session_arrays(4, F=6)
        fuse_session_checkpointed(
            *args, chunk_frames=2, ckpt_dir=tmp_path, max_chunks=1,
            window_policy="newest", **KW
        )
        with pytest.raises(ValueError, match="window_policy"):
            fuse_session_checkpointed(
                *args, chunk_frames=2, ckpt_dir=tmp_path,
                window_policy="split", **KW
            )
