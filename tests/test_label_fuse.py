"""Session-scale label fusion: shipped kernels + sharded variant parity."""

import numpy as np
import jax.numpy as jnp

from fusion3dseg_tpu.ops import label_fuse
from fusion3dseg_tpu.parallel import sharding
from fusion3dseg_tpu.parallel.label_fuse import (
    label_fuse_sharded,
    label_fuse_sharded_cells,
    label_fuse_sharded_points,
    plan_cell_shards,
)


def _workload(rng, N=800, F=16, hw=(32, 24)):
    pts = (rng.normal(size=(N, 3)) + [0, 0, 3.0]).astype(np.float32)
    K = np.array([[20.0, 0, 12], [0, 20.0, 16], [0, 0, 1]], np.float32)
    quats = np.tile([1.0, 0, 0, 0], (F, 1)).astype(np.float32)
    trans = (rng.normal(size=(F, 3)) * 0.1).astype(np.float32)
    masks = rng.integers(0, 10, (F, hw[0] * hw[1])).astype(np.uint8)
    return pts, K, quats, trans, masks


class TestLabelFuse:
    def test_full_matches_oracle_spec(self, rng):
        import bench  # the oracle lives beside the bench driver

        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, hw=hw)
        run = label_fuse.tpu_label_fuse(len(pts), 10, hw)
        _, classes = run(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        _, oracle_classes = bench.cpu_label_fuse(
            pts, K.astype(np.float64), quats, trans, masks, 10, hw
        )
        # tiny workload -> few votes/point, so f32-vs-f64 floor flips move
        # single votes; large-scale agreement (>=99.99%) is asserted by
        # bench.py on the 1M-pt config
        agree = (np.asarray(classes) == oracle_classes).mean()
        assert agree > 0.97, agree

    def test_culled_matches_full(self, rng):
        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, N=2000, F=8, hw=hw)
        # circularize the trajectory so the view index is meaningful
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        trans = np.stack([np.cos(ang) * 0.2, np.zeros(8), np.sin(ang) * 0.2], -1).astype(np.float32)
        run_full = label_fuse.tpu_label_fuse(len(pts), 10, hw)
        _, c_full = run_full(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        order_ext, starts, M = label_fuse.build_view_index(
            pts, K, quats, trans, hw, subsample=1, pad=8
        )
        run_culled = label_fuse.tpu_label_fuse_culled(len(pts), 10, hw, M)
        _, c_culled = run_culled(
            jnp.asarray(pts[order_ext]), jnp.asarray(order_ext, jnp.int32),
            jnp.asarray(starts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        agree = (np.asarray(c_full) == np.asarray(c_culled)).mean()
        assert agree > 0.999, agree

    def test_sharded_matches_single_chip(self, rng):
        mesh = sharding.make_mesh(8, tp=1)
        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, hw=hw)
        classes_sh = np.asarray(
            label_fuse_sharded(
                mesh, jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
                jnp.asarray(trans), jnp.asarray(masks), hw, nclasses=10,
            )
        )
        run = label_fuse.tpu_label_fuse(len(pts), 10, hw)
        _, classes_1 = run(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        np.testing.assert_array_equal(classes_sh, np.asarray(classes_1))

    def test_point_sharded_matches_single_chip(self, rng):
        # the >1M-point scaling axis: per-device z-buffers merged by pmin
        mesh = sharding.make_mesh(8, tp=1)
        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, hw=hw)
        classes_sh = np.asarray(
            label_fuse_sharded_points(
                mesh, jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
                jnp.asarray(trans), jnp.asarray(masks), hw, nclasses=10,
            )
        )
        run = label_fuse.tpu_label_fuse(len(pts), 10, hw)
        _, classes_1 = run(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        np.testing.assert_array_equal(classes_sh, np.asarray(classes_1))

    def test_cell_sharded_matches_single_chip(self, rng):
        # cell-sharded: each device owns a KD-cell range (spatial shard of
        # cloud + cells-table memory), per-frame owned-visible-cell
        # z-buffers merged by one pmin collective
        mesh = sharding.make_mesh(8, tp=1)
        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, N=3000, F=12, hw=hw)
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        trans = np.stack(
            [np.cos(ang) * 0.3, np.zeros(12), np.sin(ang) * 0.3], -1
        ).astype(np.float32)
        quats = np.stack(
            [np.cos(ang / 2), np.zeros(12), np.sin(ang / 2), np.zeros(12)],
            -1,
        ).astype(np.float32)
        cells_table, cell_lists, counts = label_fuse.build_cell_index(
            pts, K, quats, trans, hw, cell_size=64
        )
        dev_lists, valid = plan_cell_shards(
            cells_table, cell_lists, counts, 8
        )
        classes_sh = np.asarray(
            label_fuse_sharded_cells(
                mesh, cells_table, dev_lists, valid, jnp.asarray(K),
                jnp.asarray(quats), jnp.asarray(trans), jnp.asarray(masks),
                hw, npts=len(pts), nclasses=10,
            )
        )
        run = label_fuse.tpu_label_fuse(len(pts), 10, hw)
        _, classes_1 = run(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        # tie-break deviation (in-cell order / device rank vs global id)
        # flips votes on exact quantized-depth ties only — at this dense
        # synthetic shape (4 pts/pixel/frame) that is 4 of 3000 points,
        # every one verified to sit in a genuine 11-bit-zq tie pair
        agree = (classes_sh == np.asarray(classes_1)).mean()
        assert agree >= 0.995, agree


class TestBigKernel:
    def test_big_matches_small_at_matched_spec(self, rng):
        hw = (32, 24)
        N, F = 5000, 8
        pts = (rng.normal(size=(N, 3)) + [0, 0, 3.0]).astype(np.float32)
        K = np.array([[20.0, 0, 12], [0, 20.0, 16], [0, 0, 1]], np.float32)
        ang = np.linspace(0, 2 * np.pi, F, endpoint=False)
        trans = np.stack(
            [np.cos(ang) * 0.2, np.zeros(F), np.sin(ang) * 0.2], -1
        ).astype(np.float32)
        quats = np.tile([1.0, 0, 0, 0], (F, 1)).astype(np.float32)
        masks = rng.integers(0, 10, (F, hw[0] * hw[1])).astype(np.uint8)
        order_ext, starts, M = label_fuse.build_view_index(
            pts, K, quats, trans, hw, subsample=1, pad=8, round_to=1024
        )
        assert M % 1024 == 0 and M // 1024 > 1  # exercises the sub-slice combine
        args = (
            jnp.asarray(pts[order_ext]), jnp.asarray(order_ext, jnp.int32),
            jnp.asarray(starts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        _, c_small = label_fuse.tpu_label_fuse_culled(N, 10, hw, M)(*args)
        _, c_big = label_fuse.tpu_label_fuse_culled_big(
            N, 10, hw, M, shard_bits=10
        )(*args)
        # EXACT: gid-range sharding makes the packed low bits the gid's low
        # bits, so depth ties resolve by global id in every regime — the big
        # kernel matches the 2^20-id kernel bit-for-bit
        np.testing.assert_array_equal(np.asarray(c_small), np.asarray(c_big))

        # bucketed builder in the gid-sharded regime (id_bits=10 -> NSUB=5
        # despite the small N): same result as the single-M 2^20-id kernel
        counts = label_fuse.build_view_index.last_window_counts
        perm, sizes, Ms = label_fuse.plan_window_buckets(
            counts, nbuckets=2, round_to=1024, max_window=M
        )
        run_b = label_fuse.tpu_label_fuse_culled_bucketed(
            N, 10, hw, Ms, sizes, id_bits=10
        )
        _, c_bk = run_b(
            args[0], args[1], jnp.asarray(np.asarray(args[2])[perm]), args[3],
            jnp.asarray(np.asarray(args[4])[perm]),
            jnp.asarray(np.asarray(args[5])[perm]),
            jnp.asarray(np.asarray(args[6])[perm]),
        )
        np.testing.assert_array_equal(np.asarray(c_small), np.asarray(c_bk))


class TestBucketed:
    def test_plan_window_buckets(self, rng):
        counts = rng.integers(5_000, 60_000, 64)
        perm, sizes, Ms = label_fuse.plan_window_buckets(
            counts, nbuckets=4, round_to=4096, max_window=65536
        )
        assert sorted(perm.tolist()) == list(range(64))
        assert sum(sizes) == 64
        assert all(m % 4096 == 0 for m in Ms)
        # every frame's window count fits its bucket's M
        o = 0
        for sz, m in zip(sizes, Ms):
            assert counts[perm[o:o + sz]].max() <= m
            o += sz
        # degenerate: all counts equal -> one bucket
        _, sizes1, Ms1 = label_fuse.plan_window_buckets(
            np.full(10, 7_000), nbuckets=4, round_to=4096
        )
        assert sizes1 == [10] and Ms1 == [8192]

    def test_bucketed_matches_single_m(self, rng):
        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, N=3000, F=12, hw=hw)
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        trans = np.stack(
            [np.cos(ang) * 0.2, np.zeros(12), np.sin(ang) * 0.2], -1
        ).astype(np.float32)
        order_ext, starts, M = label_fuse.build_view_index(
            pts, K, quats, trans, hw, subsample=1, pad=8, round_to=256
        )
        counts = label_fuse.build_view_index.last_window_counts
        perm, sizes, Ms = label_fuse.plan_window_buckets(
            counts, nbuckets=3, round_to=256, max_window=M
        )
        args_ext = (jnp.asarray(pts[order_ext]), jnp.asarray(order_ext, jnp.int32))
        run_b = label_fuse.tpu_label_fuse_culled_bucketed(
            len(pts), 10, hw, Ms, sizes
        )
        (tot_b, vmax_b), c_b = run_b(
            *args_ext, jnp.asarray(starts[perm]), jnp.asarray(K),
            jnp.asarray(quats[perm]), jnp.asarray(trans[perm]),
            jnp.asarray(masks[perm]),
        )
        run_s = label_fuse.tpu_label_fuse_culled(len(pts), 10, hw, M)
        (tot_s, vmax_s), c_s = run_s(
            *args_ext, jnp.asarray(starts), jnp.asarray(K),
            jnp.asarray(quats), jnp.asarray(trans), jnp.asarray(masks),
        )
        np.testing.assert_array_equal(np.asarray(c_b), np.asarray(c_s))
        np.testing.assert_array_equal(np.asarray(tot_b), np.asarray(tot_s))
        np.testing.assert_array_equal(np.asarray(vmax_b), np.asarray(vmax_s))

    def test_cells_matches_full(self, rng):
        # KD-cell frustum culling must be bit-identical to the unculled
        # kernel: conservative cell lists + duplicate-padding that is a
        # no-op under min z-buffer and set-votes. Rotating cameras make
        # some frames see few/zero cells (exercises list padding).
        hw = (32, 24)
        pts, K, quats, trans, masks = _workload(rng, N=3000, F=12, hw=hw)
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        trans = np.stack(
            [np.cos(ang) * 0.3, np.zeros(12), np.sin(ang) * 0.3], -1
        ).astype(np.float32)
        quats = np.stack(
            [np.cos(ang / 2), np.zeros(12), np.sin(ang / 2), np.zeros(12)],
            -1,
        ).astype(np.float32)
        run_full = label_fuse.tpu_label_fuse(len(pts), 10, hw)
        (tot_f, vmax_f), c_full = run_full(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(quats),
            jnp.asarray(trans), jnp.asarray(masks),
        )
        for id_bits in (20, 10):  # single-sub and gid-range-sharded paths
            cells_table, cell_lists, counts = label_fuse.build_cell_index(
                pts, K, quats, trans, hw, cell_size=64
            )
            perm, sizes, Ks = label_fuse.plan_window_buckets(
                counts, nbuckets=3, round_to=2,
                max_window=cell_lists.shape[1],
            )
            run_c = label_fuse.tpu_label_fuse_cells(
                len(pts), 10, hw, Ks, sizes,
                id_bits=id_bits,
            )
            (tot_c, vmax_c), c_cells = run_c(
                jnp.asarray(cells_table), jnp.asarray(cell_lists[perm]),
                jnp.asarray(K), jnp.asarray(quats[perm]),
                jnp.asarray(trans[perm]), jnp.asarray(masks[perm]),
            )
            np.testing.assert_array_equal(np.asarray(c_cells), np.asarray(c_full))
            np.testing.assert_array_equal(np.asarray(tot_c), np.asarray(tot_f))
            np.testing.assert_array_equal(np.asarray(vmax_c), np.asarray(vmax_f))
        # the one-call wrapper composes the same pieces
        (tot_w, vmax_w), c_wrap = label_fuse.label_fuse_session(
            pts, K, quats, trans, masks, hw, nclasses=10, cell_size=64,
            nbuckets=3,
        )
        np.testing.assert_array_equal(np.asarray(c_wrap), np.asarray(c_full))
        np.testing.assert_array_equal(np.asarray(tot_w), np.asarray(tot_f))
        np.testing.assert_array_equal(np.asarray(vmax_w), np.asarray(vmax_f))


class TestPallasHistogram:
    def test_matches_xla_histogram(self, rng):
        from fusion3dseg_tpu.ops.histogram import histogram_classify_tpu

        F, N, nc = 13, 1024, 10
        C = rng.integers(0, nc + 1, (F, N)).astype(np.uint8)
        C[rng.random((F, N)) < 0.3] = 255  # INVALID
        (tot_p, vmax_p), cls_p = histogram_classify_tpu(
            jnp.asarray(C), nc, 0.5, tile_n=256, interpret=True
        )
        (tot_x, vmax_x), cls_x = label_fuse._histogram_classify(
            jnp.asarray(C), nc, 0.5
        )
        np.testing.assert_array_equal(np.asarray(tot_p), np.asarray(tot_x))
        np.testing.assert_array_equal(np.asarray(vmax_p), np.asarray(vmax_x))
        np.testing.assert_array_equal(np.asarray(cls_p), np.asarray(cls_x))
