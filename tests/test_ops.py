"""Parity tests for core ops: z-buffer, voting, components, neighbors, OBB."""

import numpy as np
import jax.numpy as jnp

from fusion3dseg_tpu.ops import zbuffer, voting, components, neighbors, obb

import oracle


class TestZBuffer:
    def test_nearest_wins(self, rng):
        H, W = 16, 12
        n = 200
        u = rng.integers(-2, W + 2, n).astype(np.int32)
        v = rng.integers(-2, H + 2, n).astype(np.int32)
        z = rng.uniform(0.1, 5.0, n).astype(np.float32)
        valid = rng.random(n) > 0.1
        uv2pt = np.asarray(
            zbuffer.zbuffer_uv2pt(
                jnp.asarray(u), jnp.asarray(v), jnp.asarray(z), jnp.asarray(valid), H, W
            )
        )
        # oracle: per pixel the min-depth valid in-bounds point, min idx on ties
        want = np.full(H * W, -1, np.int32)
        best = np.full(H * W, np.inf)
        for i in range(n):
            if not valid[i] or not (0 <= u[i] < W and 0 <= v[i] < H) or z[i] <= 0:
                continue
            p = v[i] * W + u[i]
            if z[i] < best[p] or (z[i] == best[p] and i < want[p]):
                best[p], want[p] = z[i], i
        np.testing.assert_array_equal(uv2pt, want)

    def test_empty(self):
        uv2pt = zbuffer.zbuffer_uv2pt(
            jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
            jnp.ones(4), jnp.zeros(4, bool), 4, 4,
        )
        assert (np.asarray(uv2pt) == -1).all()

    def test_allones_id_at_far_plane_never_aliases_sentinel(self):
        """The all-ones id at the top depth bin would pack to exactly
        INT32_MAX (the empty-pixel sentinel) and silently lose every pixel
        it wins; the guard nudges that one id's top bin down. Applies to
        packed_pmin (ids == 2^id_bits - 1 only reachable from gid-sharded
        callers / LB-wide slot spaces) and packed_pmin_gid_sharded (last
        local id of EVERY sub-range)."""
        top = (1 << 20) - 1
        one = jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([99.0])
        valid = jnp.asarray([True])

        pmin = np.asarray(zbuffer.packed_pmin(
            *one, jnp.asarray([top]), valid, 2, 2, id_bits=20))
        assert pmin[0] != zbuffer.INT32_MAX
        assert pmin[0] & top == top  # the id survives the nudge

        for gid in (top, (1 << 21) - 1):  # sub 0 and sub 1 all-ones lows
            pm = np.asarray(zbuffer.packed_pmin_gid_sharded(
                *one, jnp.asarray([gid]), valid, 2, 2, nsub=2, id_bits=20))
            s = gid >> 20
            assert pm[s, 0] != zbuffer.INT32_MAX
            assert (pm[s, 0] & top) + (s << 20) == gid

        # a nearer competitor still beats the nudged far point
        u = jnp.asarray([0, 0]); v = jnp.asarray([0, 0])
        z = jnp.asarray([99.0, 1.0])
        pmin = np.asarray(zbuffer.packed_pmin(
            u, v, z, jnp.asarray([top, 5]), jnp.asarray([True, True]),
            2, 2, id_bits=20))
        assert pmin[0] & top == 5


class TestVoting:
    def _mk(self, rng, npts=50, nc=10, F=6, npix=100):
        uv2pt = rng.integers(-1, npts, size=(F, npix)).astype(np.int32)
        masks = rng.integers(0, nc, size=(F, npix)).astype(np.uint8)
        return uv2pt, masks, npts, nc

    def test_dedup_matches_reference_fancy_index(self, rng):
        uv2pt, masks, npts, nc = self._mk(rng)
        got = np.asarray(voting.vote_all_frames(jnp.asarray(uv2pt), jnp.asarray(masks), npts, nc, dedup=True))
        want = np.zeros((npts, nc + 1))
        for f in range(len(uv2pt)):
            oracle.vote(want, uv2pt[f], masks[f])
        np.testing.assert_array_equal(got, want)

    def test_addat_matches_counting(self, rng):
        uv2pt, masks, npts, nc = self._mk(rng)
        got = np.asarray(voting.vote_all_frames(jnp.asarray(uv2pt), jnp.asarray(masks), npts, nc, dedup=False))
        want = np.zeros((npts, nc + 1))
        for f in range(len(uv2pt)):
            oracle.vote_add_at(want, uv2pt[f], masks[f])
        np.testing.assert_array_equal(got, want)

    def test_classify_matches_oracle(self, rng):
        npts, nc = 300, 12
        votes = rng.integers(0, 5, size=(npts, nc + 1)).astype(np.int32)
        votes[rng.random(npts) < 0.2] = 0  # some unvoted points
        for fc in (None, (3, 7, 9)):
            got = np.asarray(voting.classify(jnp.asarray(votes), 0.5, nc, fc))
            want = oracle.classify(votes.copy(), 0.5, nc, list(fc) if fc else None)
            np.testing.assert_array_equal(got, want)

    def test_threshold_boundary(self):
        # prob exactly == threshold stays classified (reference keeps >=)
        votes = np.zeros((2, 5), np.int32)
        votes[0, 1] = 1
        votes[0, 2] = 1  # prob 0.5
        votes[1, 3] = 1  # prob 1.0
        got = np.asarray(voting.classify(jnp.asarray(votes), 0.5, 4, None))
        assert got[0] == 1 and got[1] == 3


class TestComponents:
    def test_csr_split_matches_dense(self, rng):
        """split_into_instances over a ragged CSR adjacency (the stored
        artifact form, no [N, max_degree] densify) must match the dense
        path exactly — both backends."""
        n = 800
        centers = rng.normal(size=(6, 3)) * 4
        pts = (centers[rng.integers(0, 6, n)]
               + rng.normal(size=(n, 3)) * 0.2).astype(np.float32)
        classes = rng.integers(0, 3, n).astype(np.int32)
        lists = oracle.radius_neighbors(pts, 0.35)
        k = max(len(r) for r in lists)
        dense = neighbors.lists_to_adjacency(lists, k=max(k, 1))
        csr = neighbors.lists_to_csr(lists)
        np.testing.assert_array_equal(
            neighbors.csr_to_adjacency(*csr), dense)
        for backend in ("auto", "device"):
            a = components.split_into_instances(
                classes, dense, 3, None, 5, backend=backend)
            b = components.split_into_instances(
                classes, csr, 3, None, 5, backend=backend)
            np.testing.assert_array_equal(a[1], b[1])
            np.testing.assert_array_equal(a[3], b[3])
            assert a[2] == b[2]

    def test_by_radius_matches_adjacency_split(self, rng):
        """split_into_instances_by_radius (one-pass native grid union-find,
        the e2e fast path) must produce the same instances as the
        adjacency-based split over FULL (uncapped) radius lists."""
        n = 900
        centers = rng.normal(size=(6, 3)) * 4
        pts = (centers[rng.integers(0, 6, n)]
               + rng.normal(size=(n, 3)) * 0.2).astype(np.float32)
        classes = rng.integers(0, 3, n).astype(np.int32)
        # some unclassified points too (nclasses sentinel)
        classes[rng.integers(0, n, 40)] = 3
        r = 0.35
        lists = oracle.radius_neighbors(pts, r)
        adj = neighbors.lists_to_adjacency(
            lists, k=max(len(x) for x in lists))
        for icls, minpts in ((None, 5), ([0, 2], 1), ([1], 30)):
            a = components.split_into_instances(
                classes, adj, 3, icls, minpts)
            b = components.split_into_instances_by_radius(
                classes, pts, r, 3, icls, minpts)
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])
            np.testing.assert_array_equal(a[3], b[3])
            assert a[2] == b[2]

    def test_matches_bfs_oracle(self, rng):
        # clustered random points so the graph has nontrivial components
        n = 400
        centers = rng.normal(size=(8, 3)) * 5
        pts = (centers[rng.integers(0, 8, n)] + rng.normal(size=(n, 3)) * 0.2).astype(np.float32)
        classes = rng.integers(0, 3, n).astype(np.int32)
        r = 0.35
        lists = oracle.radius_neighbors(pts, r)
        adj = neighbors.lists_to_adjacency(lists, k=64)
        got = np.asarray(components.propagate_labels(jnp.asarray(adj), jnp.asarray(classes)))
        # restrict oracle adjacency to same-class edges
        want = oracle.flood_fill_components(classes, lists)
        # same partition (labels are both min-point-index representatives)
        np.testing.assert_array_equal(got, want)

    def test_split_into_instances_contract(self, rng):
        # two separated blobs of the same class + one tiny cluster
        a = rng.normal(size=(120, 3)) * 0.1
        b = rng.normal(size=(150, 3)) * 0.1 + 10
        c = rng.normal(size=(3, 3)) * 0.01 + 20
        pts = np.vstack([a, b, c]).astype(np.float32)
        classes = np.full(len(pts), 7, np.int32)
        lists = oracle.radius_neighbors(pts, 0.5)
        adj = neighbors.lists_to_adjacency(lists, k=64)
        uids, ids, info, out_classes = components.split_into_instances(
            classes, adj, nclasses=133, instance_classes=[7], minimum_points=10
        )
        # blobs a and b get distinct ids; c pools into small-disjoint cat 133
        assert len(np.unique(ids[:120])) == 1
        assert len(np.unique(ids[120:270])) == 1
        assert ids[0] != ids[121]
        assert (out_classes[270:] == 133).all()
        cats = {i["id"]: i["category_id"] for i in info}
        assert cats[ids[270]] == 133
        areas = {i["id"]: i["area"] for i in info}
        assert areas[ids[0]] == 120 and areas[ids[121]] == 150 and areas[ids[270]] == 3

    def test_semantic_classes_single_id(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        classes = np.r_[np.full(25, 2), np.full(25, 5)].astype(np.int32)
        lists = oracle.radius_neighbors(pts, 10.0)  # fully connected
        adj = neighbors.lists_to_adjacency(lists, k=64)
        _, ids, info, _ = components.split_into_instances(
            classes, adj, nclasses=133, instance_classes=[5], minimum_points=1
        )
        # class 2 is semantic -> exactly one id covering its 25 points
        assert len(np.unique(ids[:25])) == 1
        sem = [i for i in info if not i["isthing"]]
        assert sem[0]["category_id"] == 2 and sem[0]["area"] == 25


class TestNeighbors:
    def test_radius_graph_matches_bruteforce(self, rng):
        n = 300
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        r = 0.4
        adj = np.asarray(neighbors.radius_graph(jnp.asarray(pts), r, k=64, cap_per_cell=32, chunk=128))
        lists = oracle.radius_neighbors(pts, r)
        for i in range(n):
            got = set(adj[i][adj[i] >= 0].tolist())
            want = set(int(x) for x in lists[i])
            assert got == want, f"point {i}: {got ^ want}"

    def test_truncation_keeps_nearest(self, rng):
        pts = np.zeros((10, 3), np.float32)
        pts[:, 0] = np.arange(10) * 0.01  # all within radius of each other
        adj = np.asarray(neighbors.radius_graph(jnp.asarray(pts), 1.0, k=3, cap_per_cell=16))
        # k=3 keeps self + the two nearest
        assert (adj >= 0).all()
        assert adj[0, 0] == 0 and set(adj[0, 1:].tolist()) == {1, 2}


class TestOBB:
    def test_axis_aligned_box(self, rng):
        pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32) * np.array([4.0, 2.0, 1.0], np.float32)
        ids = np.zeros(500, np.int32)
        centers, axes, half, cnt = obb.instance_obbs(jnp.asarray(pts), jnp.asarray(ids), 1)
        assert int(cnt[0]) == 500
        # box midpoint lands near the distribution center (not the centroid)
        np.testing.assert_allclose(np.asarray(centers)[0], pts.mean(0), atol=0.5)
        h = np.sort(np.asarray(half)[0])[::-1]
        assert h[0] > h[1] > h[2]
        inside = obb.points_inside_obbs(jnp.asarray(pts), centers, axes, half)
        assert np.asarray(inside)[0].all()

    def test_intersection_matrix(self, rng):
        a = rng.normal(size=(100, 3)) * 0.5
        b = rng.normal(size=(100, 3)) * 0.5 + np.array([0.7, 0, 0])  # overlaps a
        c = rng.normal(size=(100, 3)) * 0.5 + 50  # far away
        pts = np.vstack([a, b, c]).astype(np.float32)
        ids = np.r_[np.zeros(100), np.ones(100), np.full(100, 2)].astype(np.int32)
        inter, *_ = obb.obb_intersection_matrix(jnp.asarray(pts), jnp.asarray(ids), 3)
        inter = np.asarray(inter)
        assert inter[0, 1] and inter[1, 0]
        assert not inter[0, 2] and not inter[1, 2]

    def test_hash_fallback_degenerate_extent(self, rng):
        """A radius tiny vs the cloud extent (> 2^24 cells) routes the
        native build to the hash-grid fallback; semantics are unchanged
        (self + exact duplicates within radius)."""
        from fusion3dseg_tpu.io import native

        if not native.available():
            import pytest

            pytest.skip("native lib unavailable")
        pts = rng.uniform(0, 100, (500, 3)).astype(np.float32)
        pts[100] = pts[7]  # exact duplicate pair
        adj = native.radius_graph(pts, 1e-6, k=4)  # ~1e8 cells/axis
        # every row starts with a self/duplicate set
        row7 = set(adj[7][adj[7] >= 0].tolist())
        assert row7 == {7, 100}
        row42 = set(adj[42][adj[42] >= 0].tolist())
        assert row42 == {42}
        cc = native.connected_components(pts, 1e-6)
        assert cc[100] == cc[7] and len(np.unique(cc)) == 499

    def test_host_matches_device(self, rng):
        # host NumPy path (merge_bb's small-K fast path) agrees with the
        # device program: same intersection matrix, same boxes/counts up to
        # f32-vs-f64 tolerance
        a = rng.normal(size=(150, 3)) * 0.5
        b = rng.normal(size=(120, 3)) * 0.5 + np.array([0.7, 0, 0])
        c = rng.normal(size=(90, 3)) * 0.5 + 50
        noise = rng.normal(size=(40, 3)) * 30  # ids < 0: ignored by both
        pts = np.vstack([a, b, c, noise]).astype(np.float32)
        ids = np.r_[
            np.zeros(150), np.ones(120), np.full(90, 2), np.full(40, -1)
        ].astype(np.int32)
        inter_d, cen_d, ax_d, half_d, cnt_d = obb.obb_intersection_matrix(
            jnp.asarray(pts), jnp.asarray(ids), 3
        )
        inter_h, cen_h, ax_h, half_h, cnt_h = obb.obb_intersection_matrix_np(
            pts, ids, 3
        )
        np.testing.assert_array_equal(np.asarray(inter_d), inter_h)
        np.testing.assert_array_equal(np.asarray(cnt_d), cnt_h)
        np.testing.assert_allclose(np.asarray(cen_d), cen_h, atol=1e-3)
        np.testing.assert_allclose(np.asarray(half_d), half_h, atol=1e-3)
        # axes match up to per-axis sign (eigh sign is arbitrary)
        dots = np.einsum("kij,kij->ki", np.asarray(ax_d), ax_h)
        np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-3)

    def test_host_empty_and_degenerate(self):
        # empty instance -> zero box, never intersects; <4 points -> excluded
        pts = np.asarray(
            [[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [5, 5, 5]], np.float32
        )
        ids = np.asarray([0, 0, 0, 2], np.int32)  # id 1 empty, id 2 has 1 pt
        inter, centers, axes, half, cnt = obb.obb_intersection_matrix_np(
            pts, ids, 3
        )
        assert cnt.tolist() == [3, 0, 1]
        assert not inter.any()  # all below the 4-point minimum
        np.testing.assert_array_equal(half[1], 0)

    def test_merge_union_find(self):
        K = 4
        inter = np.zeros((K, K), bool)
        inter[1, 2] = inter[2, 1] = True
        inter[2, 3] = inter[3, 2] = True
        parents = np.array([0, 5, 5, 5])
        mergeable = np.array([False, True, True, True])  # id 0 = background
        root = obb.merge_intersecting_instances(inter, parents, mergeable)
        assert root[1] == root[2] == root[3] == 1
        assert root[0] == 0

    def test_no_merge_across_parents(self):
        inter = np.ones((2, 2), bool)
        root = obb.merge_intersecting_instances(
            inter, np.array([1, 2]), np.array([True, True])
        )
        assert root[0] == 0 and root[1] == 1
