"""Tests: 2D segmenter model, sharded training step, sharded voting, native lib."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusion3dseg_tpu.models import SegFormer, SegFormerConfig, create_model
from fusion3dseg_tpu.parallel import sharding, voting as pvoting
from fusion3dseg_tpu.ops import voting as voting_ops, zbuffer
from fusion3dseg_tpu.io import native

TINY = SegFormerConfig(
    num_classes=134, embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
    num_heads=(1, 2, 3, 4), decoder_dim=32, dtype=jnp.float32,
)


class TestSegFormer:
    def test_forward_shape_and_dtype(self):
        model, params = create_model(TINY, 0, (64, 64))
        x = jnp.zeros((2, 64, 64, 3))
        logits = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
        assert logits.shape == (2, 64, 64, 134)
        assert logits.dtype == jnp.float32

    def test_conf_threshold_rule(self):
        # pipeline contract: low-confidence pixels -> class 133
        from fusion3dseg_tpu.pipeline.get2dseg import Segmenter2D

        seg = Segmenter2D(config=TINY, input_hw=(64, 64))
        img = (np.random.default_rng(0).random((1, 48, 40, 3)) * 255).astype(np.uint8)
        out_all_unclassified = seg.predict_batch(img, conf_threshold=1.1)
        assert (out_all_unclassified == 133).all()
        out = seg.predict_batch(img, conf_threshold=0.0)
        assert out.shape == (1, 48, 40) and out.dtype == np.uint8
        assert out.max() <= 133


class TestSharding:
    def test_mesh_shapes(self):
        mesh = sharding.make_mesh(8)
        assert mesh.shape["dp"] * mesh.shape["tp"] == 8

    def test_train_step_runs_and_descends(self):
        mesh = sharding.make_mesh(8)
        model = SegFormer(TINY)
        params, opt_state, step, shardings = sharding.init_sharded_train(
            model, mesh, input_hw=(32, 32), learning_rate=1e-3
        )
        rng = np.random.default_rng(0)
        images = jax.device_put(
            jnp.asarray(rng.random((mesh.shape["dp"], 32, 32, 3)), jnp.float32),
            shardings["data"],
        )
        labels = jax.device_put(
            jnp.asarray(rng.integers(0, 134, (mesh.shape["dp"], 32, 32)), jnp.int32),
            shardings["data"],
        )
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, images, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0]  # optimizer reduces loss on fixed batch

    def test_boundary_mask_and_weighted_loss(self, rng):
        # boundary_mask: both sides of every 4-neighbor label edge, nothing
        # else, checked against an explicit neighbor sweep
        labels = jnp.asarray(rng.integers(0, 3, (2, 9, 7)), jnp.int32)
        m = np.asarray(sharding.boundary_mask(labels))
        lab = np.asarray(labels)
        expect = np.zeros_like(m)
        for b in range(lab.shape[0]):
            for y in range(lab.shape[1]):
                for x in range(lab.shape[2]):
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < lab.shape[1] and 0 <= xx < lab.shape[2]:
                            expect[b, y, x] |= lab[b, yy, xx] != lab[b, y, x]
        np.testing.assert_array_equal(m, expect)
        # constant labels -> no boundary anywhere
        assert not np.asarray(
            sharding.boundary_mask(jnp.full((1, 5, 5), 2, jnp.int32))
        ).any()

        # weighted CE: weights=None == all-ones weights; up-weighting a
        # high-error region moves the loss toward that region's mean nll
        logits = jnp.asarray(rng.normal(size=(2, 9, 7, 3)), jnp.float32)
        base = float(sharding.cross_entropy_loss(logits, labels))
        ones = float(sharding.cross_entropy_loss(
            logits, labels, jnp.ones(labels.shape, jnp.float32)))
        np.testing.assert_allclose(base, ones, rtol=1e-6)
        w3 = jnp.where(sharding.boundary_mask(labels), 3.0, 1.0)
        weighted = float(sharding.cross_entropy_loss(logits, labels, w3))
        assert weighted != base

    def test_train_step_boundary_weight(self):
        # boundary_weight=1 reproduces the plain step bit-for-bit; >1 gives
        # a different loss on a batch with label edges
        mesh = sharding.make_mesh(8)
        model = SegFormer(TINY)
        rng = np.random.default_rng(3)
        images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
        labels = np.zeros((8, 32, 32), np.int32)
        labels[:, :, 16:] = 5
        labels = jnp.asarray(labels)
        losses = {}
        for bw in (1.0, 4.0):
            params, opt_state, step, sh = sharding.init_sharded_train(
                model, mesh, input_hw=(32, 32), learning_rate=1e-3,
                boundary_weight=bw,
            )
            _, _, loss = step(
                params, opt_state,
                jax.device_put(images, sh["data"]),
                jax.device_put(labels, sh["data"]),
            )
            losses[bw] = float(loss)
        assert losses[1.0] != losses[4.0]

    def test_train_step_ema(self):
        # ema after one step == d*params0 + (1-d)*params1 where params1 is
        # the plain step's result on the same data; params/opt_state/loss
        # themselves are bit-identical to the plain step
        mesh = sharding.make_mesh(8)
        model = SegFormer(TINY)
        rng = np.random.default_rng(5)
        images = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 134, (8, 32, 32)), jnp.int32)

        p0, o0, step0, sh0 = sharding.init_sharded_train(
            model, mesh, input_hw=(32, 32), learning_rate=1e-3)
        imgs = jax.device_put(images, sh0["data"])
        labs = jax.device_put(labels, sh0["data"])
        p1, _, loss_plain = step0(p0, o0, imgs, labs)

        d = 0.9
        pe, oe, stepe, she = sharding.init_sharded_train(
            model, mesh, input_hw=(32, 32), learning_rate=1e-3, ema_decay=d)
        assert "ema_init" in she
        ema0 = she["ema_init"](pe)
        pe1, _, ema1, loss_e = stepe(pe, oe, ema0, imgs, labs)
        assert float(loss_e) == float(loss_plain)
        flat_p1 = jax.tree.leaves(p1)
        flat_pe1 = jax.tree.leaves(pe1)
        flat_e1 = jax.tree.leaves(ema1)
        flat_p0 = jax.tree.leaves(
            sharding.init_sharded_train(
                model, mesh, input_hw=(32, 32), learning_rate=1e-3)[0])
        for a, b in zip(flat_p1, flat_pe1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for e, a0, a1 in zip(flat_e1, flat_p0, flat_p1):
            np.testing.assert_allclose(
                np.asarray(e),
                d * np.asarray(a0) + (1 - d) * np.asarray(a1),
                rtol=1e-5, atol=1e-7,
            )

    def test_ema_checkpoint_roundtrip(self, tmp_path):
        # save_train_state(ema=...) commits ema_params_<it> + <dir>/ema/params
        # (a Segmenter2D-compatible view); load_ema restores it; absent ema
        # -> None
        from fusion3dseg_tpu.models import train as mtrain

        rng = np.random.default_rng(0)
        params = {"a": jnp.asarray(rng.random((3, 4)), jnp.float32)}
        opt = {"mu": {"a": jnp.zeros((3, 4), jnp.float32)}}
        ema = {"a": jnp.asarray(rng.random((3, 4)), jnp.float32)}
        d = tmp_path / "ck"
        mtrain.save_train_state(d, params, opt, 7, ema=ema)
        got = mtrain.load_ema(d, params)
        np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(ema["a"]))
        # the ema view loads through the plain checkpoint loader
        from fusion3dseg_tpu.pipeline.get2dseg import load_checkpoint

        via_view = load_checkpoint(d / "ema", params)
        np.testing.assert_array_equal(
            np.asarray(via_view["a"]), np.asarray(ema["a"]))
        # plain save (no ema): load_ema -> None, old layout untouched
        d2 = tmp_path / "ck2"
        mtrain.save_train_state(d2, params, opt, 3)
        assert mtrain.load_ema(d2, params) is None
        # a later save WITHOUT ema must not destroy a previously committed
        # EMA snapshot (review finding r4): the old ema_params_<it> stays,
        # and load_ema correctly reports None for the new step
        mtrain.save_train_state(d, params, opt, 9)
        assert (d / "ema_params_00000007").is_dir()
        assert mtrain.load_ema(d, params) is None
        via_view = load_checkpoint(d / "ema", params)
        np.testing.assert_array_equal(
            np.asarray(via_view["a"]), np.asarray(ema["a"]))

    def test_sharded_voting_matches_single(self, rng):
        mesh = sharding.make_mesh(8)
        F, HW, npts, nc = 16, 64, 8 * 25, 9
        uv2pt = jnp.asarray(rng.integers(-1, npts, (F, HW)), jnp.int32)
        masks = jnp.asarray(rng.integers(0, nc, (F, HW)), jnp.uint8)
        ref = np.asarray(voting_ops.vote_all_frames(uv2pt, masks, npts, nc, dedup=True))
        vf = np.asarray(pvoting.vote_sharded_frames(mesh, uv2pt, masks, npts, nc))
        np.testing.assert_array_equal(vf, ref)
        vp, classes = pvoting.vote_sharded_points(mesh, uv2pt, masks, npts, nc)
        np.testing.assert_array_equal(np.asarray(vp), ref)
        ref_classes = np.asarray(voting_ops.classify(jnp.asarray(ref), 0.5, nc, None))
        np.testing.assert_array_equal(np.asarray(classes), ref_classes)


class TestPackedZbuffer:
    def test_matches_quantized_spec(self, rng):
        H, W = 16, 12
        n = 500
        u = jnp.asarray(rng.integers(-2, W + 2, n), jnp.int32)
        v = jnp.asarray(rng.integers(-2, H + 2, n), jnp.int32)
        z = jnp.asarray(rng.uniform(0.05, 9.9, n), jnp.float32)
        valid = jnp.asarray(rng.random(n) > 0.1)
        got = np.asarray(
            zbuffer.zbuffer_uv2pt_packed(u, v, z, valid, H, W, max_depth=10.0)
        )
        # oracle with the same quantized spec
        un, vn, zn, valn = map(np.asarray, (u, v, z, valid))
        ok = valn & (zn > 0) & (un >= 0) & (un < W) & (vn >= 0) & (vn < H)
        zq = np.clip(zn * (2**11 / 10.0), 0, 2**11 - 1).astype(np.int64)
        packed = (zq << 20) | np.arange(n)
        buf = np.full(H * W, np.iinfo(np.int64).max)
        np.minimum.at(buf, vn[ok] * W + un[ok], packed[ok])
        want = np.where(buf == np.iinfo(np.int64).max, -1, buf & (2**20 - 1))
        np.testing.assert_array_equal(got, want)


class TestNative:
    def test_available_and_matches_device_graph(self, rng):
        if not native.available():
            pytest.skip("native lib unavailable")
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        r = 0.4
        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        import oracle

        lists = oracle.radius_neighbors(pts, r)
        adj = native.radius_graph(pts, r, k=64)
        for i in range(len(pts)):
            got = set(adj[i][adj[i] >= 0].tolist())
            assert got == set(int(x) for x in lists[i])

    def test_csr_lists(self, rng):
        if not native.available():
            pytest.skip("native lib unavailable")
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        lists = native.radius_graph_lists(pts, 0.5)
        import oracle

        want = oracle.radius_neighbors(pts, 0.5)
        for a, b in zip(lists, want):
            assert set(a.tolist()) == set(int(x) for x in b)

    def test_connected_components(self, rng):
        if not native.available():
            pytest.skip("native lib unavailable")
        a = rng.normal(size=(50, 3)) * 0.05
        b = rng.normal(size=(50, 3)) * 0.05 + 10
        pts = np.vstack([a, b]).astype(np.float32)
        comp = native.connected_components(pts, 0.5)
        assert len(np.unique(comp[:50])) == 1
        assert len(np.unique(comp[50:])) == 1
        assert comp[0] != comp[50]

    def test_components_from_adjacency_matches_device(self, rng):
        """The split_into_instances host fast path (C++ union-find over an
        existing adjacency) must agree with the device min-label
        propagation, including the class-edge restriction."""
        if not native.available():
            pytest.skip("native lib unavailable")
        import jax.numpy as jnp

        from fusion3dseg_tpu.ops import components, neighbors

        pts = rng.uniform(0, 2, (3000, 3)).astype(np.float32)
        classes = rng.integers(0, 3, 3000).astype(np.int32)
        adj = np.asarray(neighbors.radius_graph(jnp.asarray(pts), 0.12, k=32))
        want = np.asarray(
            components.propagate_labels(
                jnp.asarray(adj, jnp.int32), jnp.asarray(classes)
            )
        )
        got = native.components_from_adjacency(adj, classes)
        assert got is not None
        np.testing.assert_array_equal(got, want)

    def test_cli_vids_format(self, tmp_path, rng):
        import subprocess, pathlib

        exe = pathlib.Path(__file__).parents[1] / "native" / "connected_graph"
        if not exe.is_file():
            pytest.skip("cli not built")
        pts = np.vstack([
            rng.normal(size=(30, 3)) * 0.05,
            rng.normal(size=(30, 3)) * 0.05 + 5,
        ])
        incsv = tmp_path / "in.csv"
        np.savetxt(incsv, pts, delimiter=",", header="x,y,z")
        out = tmp_path / "out.csv"
        subprocess.run([str(exe), str(incsv), str(out), "0", "0.5", "0", "0"], check=True)
        lines = out.read_text().strip().splitlines()
        assert lines[0] == "VIDs"
        sizes = sorted(int(l.split(",")[0]) for l in lines[1:])
        assert sizes == [30, 30]


class TestSpatialShardedFusion:
    def _session(self, F=16, h=48, w=36):
        from fusion3dseg_tpu.io import rtab, synthetic

        sess = synthetic.make_session(nframes=F, depth_hw=(h, w))
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        args = (
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            jnp.asarray(valid),
        )
        return sess, args

    def test_spatial_sharded_matches_sequential(self):
        """Buffer-sharded engine vs the single-device scan: same scan
        semantics (no reconciliation), so the bars are TIGHTER than the
        frame-sharded decomposition's — near-equal point counts and >= 0.9
        per-pixel label agreement through the uv2pt artifacts."""
        from fusion3dseg_tpu.fusion import fusion as fusion_engine
        from fusion3dseg_tpu.parallel.fusion import fuse_session_spatial_sharded

        mesh = sharding.make_mesh(8, tp=1)
        F, h, w = 16, 48, 36
        sess, args = self._session(F, h, w)
        radius, cone = 0.08, float(np.cos(np.deg2rad(20.0)))
        total_cap = 1 << 15  # unsaturated: the session fuses to ~13k points
        kw = dict(height=h, width=w, radius=radius, min_cosine=cone,
                  max_depth=8.0)
        state1, uv1 = fusion_engine.fuse_session(
            *args, capacity=total_cap, **kw
        )
        stateS, uvS = fuse_session_spatial_sharded(
            mesh, *args, capacity=total_cap // 8, **kw
        )
        n1, nS = int(state1.n), int(stateS.n)
        # identical scan semantics -> near-identical size (measured: exactly
        # equal on this session; allow tie-break slack)
        assert nS > 0 and 0.95 * n1 <= nS <= 1.05 * n1, (n1, nS)

        # uv2pt artifact contract on the compacted cloud
        uvS_np = np.asarray(uvS)
        assert uvS_np.dtype == np.int32 and uvS_np.shape == (F, h * w)
        assert uvS_np.max() < nS and uvS_np.min() >= -1

        # coverage both ways (no region may be dropped or duplicated badly)
        p1 = np.asarray(state1.points[:n1])
        pS = np.asarray(stateS.points[:nS])
        d2 = ((p1[:, None, :] - pS[None, :, :]) ** 2).sum(-1)
        assert np.percentile(np.sqrt(d2.min(axis=1)), 99) < 2 * np.sqrt(3) * radius
        assert np.percentile(np.sqrt(d2.min(axis=0)), 99) < 2 * np.sqrt(3) * radius

        # label agreement through voting (the semantic bar)
        masks = sess.gt_mask.reshape(F, -1)
        _, c1 = voting_ops.vote_and_classify(
            jnp.asarray(np.asarray(uv1)), jnp.asarray(masks), npts=n1,
            nclasses=133, threshold=0.5, dedup=True,
        )
        _, cS = voting_ops.vote_and_classify(
            jnp.asarray(uvS_np), jnp.asarray(masks), npts=nS,
            nclasses=133, threshold=0.5, dedup=True,
        )
        c1, cS = np.asarray(c1), np.asarray(cS)
        uv1_np = np.asarray(uv1)
        img1 = np.where(uv1_np >= 0, c1[np.clip(uv1_np, 0, n1 - 1)], -1)
        imgS = np.where(uvS_np >= 0, cS[np.clip(uvS_np, 0, nS - 1)], -1)
        both = (img1 >= 0) & (imgS >= 0)
        assert both.mean() > 0.5, both.mean()
        agree = (img1[both] == imgS[both]).mean()
        assert agree > 0.9, agree

    def test_spatial_sharded_windowed(self):
        """Per-shard windowing on the sharded buffer: a window below the
        per-device capacity still produces a valid, well-covered cloud."""
        from fusion3dseg_tpu.parallel.fusion import fuse_session_spatial_sharded

        mesh = sharding.make_mesh(8, tp=1)
        F, h, w = 8, 48, 36
        sess, args = self._session(F, h, w)
        kw = dict(height=h, width=w, radius=0.08,
                  min_cosine=float(np.cos(np.deg2rad(20.0))), max_depth=8.0)
        stateW, uvW = fuse_session_spatial_sharded(
            mesh, *args, capacity=1 << 10, window=1 << 8, **kw
        )
        stateF, _ = fuse_session_spatial_sharded(
            mesh, *args, capacity=1 << 10, **kw
        )
        nW, nF = int(stateW.n), int(stateF.n)
        # missed merges re-append: never fewer points than the full merge
        assert nW >= nF > 0
        uv = np.asarray(uvW)
        assert uv.max() < nW and uv.min() >= -1

    def test_spatial_sharded_capacity_scales(self):
        """The whole point of the buffer shard: per-device capacity far
        below the cloud size still fuses the full scene (total = D x cap),
        where a single device at that capacity would saturate."""
        from fusion3dseg_tpu.fusion import fusion as fusion_engine
        from fusion3dseg_tpu.parallel.fusion import fuse_session_spatial_sharded

        mesh = sharding.make_mesh(8, tp=1)
        F, h, w = 8, 48, 36
        sess, args = self._session(F, h, w)
        kw = dict(height=h, width=w, radius=0.08,
                  min_cosine=float(np.cos(np.deg2rad(20.0))), max_depth=8.0)
        state1, _ = fusion_engine.fuse_session(*args, capacity=1 << 15, **kw)
        need = int(state1.n)
        per_dev = 1 << 11  # 8 devices x 2048 = 16384 total slots
        assert per_dev < need  # one device's shard alone cannot hold it
        stateS, _ = fuse_session_spatial_sharded(
            mesh, *args, capacity=per_dev, **kw
        )
        assert int(stateS.n) > 0.9 * need


class TestShardedFusion:
    def test_sharded_fusion_engine_matches_sequential(self):
        """Frame-chunk-sharded fusion (parallel/fusion.py) vs the
        single-device scan: statistical parity (voxel-merge reconciliation),
        checked by cloud coverage, size bounds, and per-pixel label
        agreement through the uv2pt artifacts."""
        from fusion3dseg_tpu.fusion import fusion as fusion_engine
        from fusion3dseg_tpu.io import rtab, synthetic
        from fusion3dseg_tpu.parallel.fusion import fuse_session_sharded

        mesh = sharding.make_mesh(8, tp=1)
        h, w = 48, 36
        sess = synthetic.make_session(nframes=16, depth_hw=(h, w))
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        radius, cone = 0.08, float(np.cos(np.deg2rad(20.0)))
        args = (
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
        )
        kw = dict(height=h, width=w, radius=radius, min_cosine=cone,
                  max_depth=8.0, capacity=1 << 13)
        state1, uv1 = fusion_engine.fuse_session(
            *args[:6], jnp.asarray(valid), **kw,
        )
        stateS, uvS = fuse_session_sharded(
            mesh, *args, jnp.asarray(valid), **kw,
        )
        n1, nS = int(state1.n), int(stateS.n)
        assert nS > 0 and n1 > 0
        # size parity up to cross-chunk voxel re-binning
        assert 0.6 * n1 < nS < 1.7 * n1, (n1, nS)

        p1 = np.asarray(state1.points[:n1])
        pS = np.asarray(stateS.points[:nS])
        # coverage: every sequential point has a merged point nearby
        d2 = ((p1[:, None, :] - pS[None, :, :]) ** 2).sum(-1)
        dmin = np.sqrt(d2.min(axis=1))
        assert np.percentile(dmin, 99) < 2 * np.sqrt(3) * radius, (
            np.percentile(dmin, 99)
        )

        # uv2pt contract + downstream label agreement through GT masks
        uvS_np = np.asarray(uvS)
        assert uvS_np.dtype == np.int32 and uvS_np.shape == (16, h * w)
        assert uvS_np.max() < nS and uvS_np.min() >= -1
        masks = sess.gt_mask.reshape(16, -1)
        from fusion3dseg_tpu.ops import voting

        _, c1 = voting.vote_and_classify(
            jnp.asarray(np.asarray(uv1)), jnp.asarray(masks), npts=n1,
            nclasses=133, threshold=0.5, dedup=True,
        )
        _, cS = voting.vote_and_classify(
            jnp.asarray(uvS_np), jnp.asarray(masks), npts=nS,
            nclasses=133, threshold=0.5, dedup=True,
        )
        c1, cS = np.asarray(c1), np.asarray(cS)
        img1 = np.where(np.asarray(uv1) >= 0, c1[np.clip(np.asarray(uv1), 0, n1 - 1)], -1)
        imgS = np.where(uvS_np >= 0, cS[np.clip(uvS_np, 0, nS - 1)], -1)
        both = (img1 >= 0) & (imgS >= 0)
        assert both.mean() > 0.3, both.mean()
        agree = (img1[both] == imgS[both]).mean()
        assert agree > 0.9, agree


class TestFuseFrameDriftGuard:
    """MECHANICAL parity guard between the single-chip fuse step and the
    spatial-sharded port (VERDICT r3 next#5).

    parallel/fusion.py's step() is a stage-by-stage mirror of
    fusion._fuse_frame with collectives spliced in; it cannot share code
    without entangling the single-chip step with the mesh, and it has
    already drifted once (the r3 frustum-window/drop-route reworks were
    back-ported by review). On a 1-device mesh every collective is an
    identity, so the two paths must produce BIT-IDENTICAL state and uv2pt
    artifacts — any behavioral change to _fuse_frame (or _seed_frame /
    _append_sparsified) that is not ported fails here.
    """

    def _run_both(self, capacity, window=None, window_policy="newest"):
        from fusion3dseg_tpu.fusion import fusion as fusion_engine
        from fusion3dseg_tpu.io import rtab, synthetic
        from fusion3dseg_tpu.parallel.fusion import fuse_session_spatial_sharded

        F, h, w = 8, 48, 36
        sess = synthetic.make_session(nframes=F, depth_hw=(h, w))
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        args = (
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            jnp.asarray(valid),
        )
        kw = dict(height=h, width=w, radius=0.08,
                  min_cosine=float(np.cos(np.deg2rad(20.0))),
                  max_depth=8.0, capacity=capacity, window=window,
                  window_policy=window_policy)
        state1, uv1 = fusion_engine.fuse_session(*args, **kw)
        mesh1 = sharding.make_mesh(1, tp=1)
        stateS, uvS = fuse_session_spatial_sharded(mesh1, *args, **kw)
        return state1, uv1, stateS, uvS

    def _assert_bit_identical(self, state1, uv1, stateS, uvS):
        n1, nS = int(state1.n), int(stateS.n)
        assert n1 == nS and n1 > 0, (n1, nS)
        for field in ("points", "normals", "colors", "nmerges",
                      "occurences"):
            a = np.asarray(getattr(state1, field))[:n1]
            b = np.asarray(getattr(stateS, field))[:n1]
            assert np.array_equal(a, b), (
                f"{field} drifted between fusion._fuse_frame and "
                "parallel/fusion.py step() — port the change "
                "(see parallel/fusion.py MAINTENANCE note)"
            )
        assert np.array_equal(np.asarray(uv1), np.asarray(uvS)), (
            "uv2pt drifted between the single-chip and spatial-sharded "
            "fuse steps — port the _fuse_frame change to parallel/fusion.py"
        )

    def test_one_device_bit_identity_full_merge(self):
        self._assert_bit_identical(*self._run_both(capacity=1 << 14))

    def test_one_device_bit_identity_windowed(self):
        # exercises the dynamic-slice window path AND the saturated-buffer
        # append path (8k cap saturates on this session)
        self._assert_bit_identical(
            *self._run_both(capacity=1 << 13, window=1 << 9)
        )

    def test_one_device_bit_identity_split_policy(self):
        # the split-window overflow policy must stay ported in lockstep too
        self._assert_bit_identical(
            *self._run_both(capacity=1 << 13, window=1 << 9,
                            window_policy="split")
        )
