"""Session-scale label fusion: project + z-buffer + vote + classify.

The production fast path for lifting 2D masks onto a session-wide point
cloud (BASELINE configs 1-3): one jitted lax.scan over frames computing a
packed z-buffer per frame, a [frames, npts] winner-class matrix, and a
batched row-sort histogram classification — no large-table scatters anywhere
(docs/DESIGN.md). With the KD-cell frustum-culling index each frame touches
only ~0.14N candidate points (`label_fuse_session` is the one-call entry;
the azimuth view index kernels remain as the simpler alternative).
bench.py drives exactly these functions.

Semantics: per frame, each point wins at most its nearest-visible pixel
(z-buffer spec: nearest at max_depth/2^11 resolution, ties -> lowest id) and
receives that pixel's mask class as one vote; classification is the
reference's thresholded argmax (voting.py:106-137).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def build_view_index(points, K, quats, trans, hw, nbuckets=512, subsample=16, pad=3,
                     round_to=32768):
    """View-coherent point index: sort points by azimuth around the
    trajectory centroid so each frame's visible set is one contiguous slice.

    Standard frustum-culling spatial index, built once per session: a
    subsample of points is projected into every frame to find the visible
    azimuth-bucket window (dilated by `pad` buckets); the sorted array is
    extended by the maximum window length so circular windows become
    contiguous dynamic slices of a STATIC length M. Slices may include extra
    (non-visible) points — harmless, they fail the z/bounds test — so the
    only approximation is a point outside the detected window for some
    frame, which the dilation makes rare and the benchmark's label-agreement
    stat monitors.

    Returns (order_ext [N+wrap] original ids, starts [F] int32, M).
    """
    c = trans.mean(0)
    az = np.arctan2(points[:, 2] - c[2], points[:, 0] - c[0])
    bucket = ((az + np.pi) / (2 * np.pi) * nbuckets).astype(np.int64) % nbuckets
    order = np.argsort(bucket, kind="stable")
    bsorted = bucket[order]
    offsets = np.searchsorted(bsorted, np.arange(nbuckets + 1))

    h, w = hw
    sub = points[::subsample]
    sub_bucket = bucket[::subsample]
    windows = []
    for f in range(len(quats)):
        q = quats[f]
        qc = np.array([q[0], -q[1], -q[2], -q[3]])
        rel = sub - trans[f]
        vq = qc[1:]
        vxp = np.cross(vq, rel)
        cam = rel + 2.0 * (qc[0] * vxp + np.cross(vq, vxp))
        z = cam[:, 2]
        with np.errstate(all="ignore"):
            u = (K[0, 0] * cam[:, 0] + K[0, 2] * z) / z
            v = (K[1, 1] * cam[:, 1] + K[1, 2] * z) / z
        ok = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        vis = np.unique(sub_bucket[ok])
        if len(vis) == 0:
            windows.append((0, 1))
            continue
        present = np.zeros(nbuckets, bool)
        present[vis] = True
        idx = np.nonzero(present)[0]
        gaps = np.diff(np.r_[idx, idx[0] + nbuckets])
        big = int(np.argmax(gaps))
        start_b = (int(idx[(big + 1) % len(idx)]) - pad) % nbuckets
        width_b = min(nbuckets, nbuckets - int(gaps.max()) + 1 + 2 * pad)
        windows.append((start_b, width_b))

    def window_count(start_b, width_b):
        end_b = start_b + width_b
        if end_b <= nbuckets:
            return offsets[end_b] - offsets[start_b]
        return (offsets[nbuckets] - offsets[start_b]) + offsets[end_b - nbuckets]

    counts = np.asarray([window_count(s, wd) for s, wd in windows])
    M = int(counts.max())
    n = len(points)
    M = int(-(-M // round_to) * round_to)  # round up: stable compile shape
    # cap near the cloud size, preserving the sub-slice constraint
    # M % round_to == 0 required by the big-N kernel
    M = min(M, int(-(-n // round_to) * round_to))
    # extend the sorted order so every circular window is a contiguous slice
    # and slices of length M stay in bounds even when M > n (tiny clouds
    # rounded up): duplicated entries are harmless candidates
    reps = -(-(M + n) // n)
    order_ext = np.tile(order, reps)[: max(n + min(M, n), M)].astype(np.int32)
    starts = np.asarray([offsets[s] for s, _ in windows], np.int32)
    starts = np.minimum(starts, len(order_ext) - M)
    build_view_index.last_window_counts = counts  # diagnostic
    return order_ext, starts, M




def build_cell_index(points, K, quats, trans, hw, cell_size=256, margin=2e-3):
    """Frustum-culling cell index: equal-count KD cells + per-frame visible
    cell lists from a conservative AABB-vs-frustum test.

    The azimuth window (build_view_index) over-covers ~50%: it culls only
    horizontally, so each frame's contiguous slice averages ~0.18N while the
    true in-frustum fraction is ~0.12N (measured on the bench workload).
    This index culls in full 3D: points are split into 2^d equal-count cells
    by recursive median cuts, each frame keeps the cells whose AABB passes
    every frustum half-space (p-vertex test, planes dilated by `margin`
    meters -> strictly conservative), and the kernel gathers candidate cells
    as contiguous [cell_size, 4] blocks (xyz + bitcast int32 id) — a
    leading-axis block gather measured ~0.2 ns/element vs the 7.3 ns/update
    serialized scatter it avoids (docs/DESIGN.md).

    Padding is EXACT, not masked: cells shorter than cell_size repeat their
    first member, and frame lists pad with cell 0 — duplicate points are
    no-ops under the min z-buffer (equal packed values) and the per-pixel
    winner vote (`set`, not add), so the kernel needs no validity lanes.

    Returns (cells_table [NC, cell_size, 4] f32, cell_lists [F, Kmax] int32,
    counts [F] int32 — true per-frame visible-cell counts).
    """
    n = len(points)
    h, w = hw
    depth = max(0, int(np.floor(np.log2(max(n // cell_size, 1)))))
    ncells = 1 << depth

    order = np.arange(n)
    segs = [(0, n)]
    for _ in range(depth):
        nxt = []
        for a, b in segs:
            idx = order[a:b]
            P = points[idx]
            ax = int(np.argmax(P.max(0) - P.min(0)))
            m = (b - a) // 2
            part = np.argpartition(P[:, ax], m)
            order[a:b] = idx[part]
            nxt += [(a, a + m), (a + m, b)]
        segs = nxt
    segs = np.asarray(segs)

    ps = points[order]
    cs = int((segs[:, 1] - segs[:, 0]).max())
    cells_table = np.empty((ncells, cs, 4), np.float32)
    lo = np.empty((ncells, 3)); hi = np.empty((ncells, 3))
    for ci, (a, b) in enumerate(segs):
        take = np.r_[np.arange(a, b), np.full(cs - (b - a), a)]
        cells_table[ci, :, :3] = ps[take]
        cells_table[ci, :, 3] = order[take].astype(np.int32).view(np.float32)
        lo[ci] = ps[a:b].min(0); hi[ci] = ps[a:b].max(0)

    # frustum planes in world space, same inequalities as the projection's
    # bounds test (u=floor(x')>=0 <=> fx*x+cx*z>=0, u<w <=> fx*x+(cx-w)z<0,
    # likewise v; plus z>0), dilated by `margin` meters
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ncam = np.array([
        [fx, 0, cx], [-fx, 0, w - cx], [0, fy, cy], [0, -fy, h - cy],
        [0, 0, 1.0],
    ])
    F = len(quats)
    counts = np.empty(F, np.int32)
    lists = []
    for f in range(F):
        q = quats[f]
        wq, x, y, zz = q[0], -q[1], -q[2], -q[3]  # conj: world->camera
        R = np.array([
            [1 - 2 * (y * y + zz * zz), 2 * (x * y - wq * zz), 2 * (x * zz + wq * y)],
            [2 * (x * y + wq * zz), 1 - 2 * (x * x + zz * zz), 2 * (y * zz - wq * x)],
            [2 * (x * zz - wq * y), 2 * (y * zz + wq * x), 1 - 2 * (x * x + y * y)],
        ])
        m = ncam @ R
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        d = -(m @ trans[f]) + margin
        pv = np.where(m[:, None, :] > 0, hi[None], lo[None])  # [5, NC, 3]
        s = np.einsum("pc,pkc->pk", m, pv) + d[:, None]
        vis = np.nonzero((s >= 0).all(0))[0]
        counts[f] = len(vis)
        lists.append(vis)
    Kmax = max(1, int(counts.max()))
    cell_lists = np.zeros((F, Kmax), np.int32)  # pad with cell 0 (harmless)
    for f, vis in enumerate(lists):
        cell_lists[f, : len(vis)] = vis
    build_cell_index.last_cell_size = cs  # diagnostic
    return cells_table, cell_lists, counts


def tpu_label_fuse_cells(
    npts, nclasses, hw, Ks, sizes, threshold=0.5, use_pallas_hist=None,
    id_bits=20,
):
    """Cell-culled bucketed label fusion (the 1M-headline fast path).

    Frames arrive grouped by visible-cell count (plan_window_buckets over
    build_cell_index's counts); each group scans with a right-sized static
    cell count Kb. Per frame: gather Kb [cs, 4] candidate blocks (block
    gather ~0.2 ns/element; cs is read off cells_table's shape at trace
    time), project, drop-invalid packed z-buffer (serialized scatter, the
    cost floor), winner-row scatter, then one Pallas histogram classify
    over the concatenated class matrix. Output is bit-identical to
    tpu_label_fuse (full uncull) because the cell lists are conservative
    supersets and padding duplicates are z-buffer/vote no-ops.

    The returned jitted callable is cached on the static config, so
    same-shaped repeat invocations (e.g. two mask sets over one session)
    reuse the compiled program instead of re-tracing a multi-minute
    compile.
    """
    import jax

    if use_pallas_hist is None:
        use_pallas_hist = jax.devices()[0].platform == "tpu"
    return _label_fuse_cells_cached(
        int(npts), int(nclasses), (int(hw[0]), int(hw[1])),
        tuple(int(k) for k in Ks), tuple(int(s) for s in sizes),
        float(threshold), bool(use_pallas_hist), int(id_bits),
    )


@lru_cache(maxsize=32)
def _label_fuse_cells_cached(
    npts, nclasses, hw, Ks, sizes, threshold, use_pallas_hist, id_bits
):
    import jax
    import jax.numpy as jnp

    from fusion3dseg_tpu.geometry import camera
    from fusion3dseg_tpu.ops.zbuffer import (
        INT32_MAX, lex_combine_gid_sharded, packed_pmin, packed_pmin_gid_sharded,
    )

    h, w = hw
    INVALID = 255
    NSUB = -(-npts // (1 << id_bits))
    TILE_N = 512
    npad = -(-npts // TILE_N) * TILE_N if use_pallas_hist else npts

    @jax.jit
    def run(cells_table, cell_lists, K, quats, trans, masks):
        Cs = []
        o = 0
        for Kb, sz in zip(Ks, sizes):
            Kb = min(Kb, cell_lists.shape[1])  # bucket round-up can pass Kmax
            sl = slice(o, o + sz)
            o += sz

            def step(_, frame):
                cl, q, t, mask = frame
                blocks = cells_table[cl]  # [Kb, cs, 4] block gather
                pts = blocks[..., :3].reshape(-1, 3)
                ids = jax.lax.bitcast_convert_type(
                    blocks[..., 3], jnp.int32
                ).reshape(-1)
                u, v, z = camera.project_points(pts, K, q, t)
                ones = jnp.ones_like(z, bool)
                if NSUB == 1:
                    pmin = packed_pmin(u, v, z, ids, ones, h, w,
                                       id_bits=id_bits, drop_invalid=True)
                    win_id = pmin & ((1 << id_bits) - 1)
                    has = pmin != INT32_MAX
                else:
                    pmin_sub = packed_pmin_gid_sharded(
                        u, v, z, ids, ones, h, w, NSUB, id_bits=id_bits,
                        z_bits=min(11, 31 - id_bits), drop_invalid=True,
                    )
                    win_id, has = lex_combine_gid_sharded(
                        pmin_sub, id_bits=id_bits,
                        z_bits=min(11, 31 - id_bits),
                    )
                row = jnp.full((npad,), INVALID, jnp.uint8)
                row = row.at[jnp.where(has, win_id, npad)].set(
                    mask.astype(jnp.uint8), mode="drop"
                )
                return None, row

            _, Ck = jax.lax.scan(
                step, None,
                (cell_lists[sl, :Kb], quats[sl], trans[sl], masks[sl]),
                unroll=4,
            )
            Cs.append(Ck)
        C = Cs[0] if len(Cs) == 1 else jnp.concatenate(Cs, axis=0)
        if use_pallas_hist:
            from fusion3dseg_tpu.ops.histogram import histogram_classify_tpu

            (total, vmax), classes = histogram_classify_tpu(
                C, nclasses, threshold, tile_n=TILE_N
            )
            return (total[:npts], vmax[:npts]), classes[:npts]
        return _histogram_classify(C, nclasses, threshold)

    return run


def label_fuse_session(points, K, quats, trans, masks, hw, nclasses=133,
                       threshold=0.5, cell_size=128, nbuckets=12,
                       id_bits=20):
    """One-call culled label fusion for a whole session.

    Builds the KD-cell frustum-culling index on the host, plans
    right-sized scan buckets, and runs `tpu_label_fuse_cells` — the same
    composition bench.py's headline uses, as a single public entry point.
    Output is bit-identical to `tpu_label_fuse` (the unculled kernel).

    Args:
      points: [N,3] float host array (world).
      K: [3,3] intrinsics at the mask resolution.
      quats, trans: [F,4] wxyz world-from-camera rotations, [F,3] camera
        centers.
      masks: [F, H*W] uint8 per-frame class images (reference mask PNG
        contract, get2DSeg.py:125-126).
      hw: (H, W) of the masks.

    Returns ((total_votes, max_votes), classes) as device arrays, classes
    [N] int32 with `nclasses` = unclassified (voting.py:106-137 rule).
    """
    import jax.numpy as jnp

    points = np.asarray(points)
    cells_table, cell_lists, counts = build_cell_index(
        points, K, quats, trans, hw, cell_size=cell_size
    )
    perm, sizes, Ks = plan_window_buckets(
        counts, nbuckets=nbuckets, round_to=8,
        max_window=cell_lists.shape[1],
    )
    run = tpu_label_fuse_cells(
        len(points), nclasses, hw, Ks, sizes,
        threshold=threshold, id_bits=id_bits,
    )
    perm = np.asarray(perm)
    return run(
        jnp.asarray(cells_table), jnp.asarray(cell_lists[perm]),
        jnp.asarray(K, jnp.float32), jnp.asarray(np.asarray(quats)[perm]),
        jnp.asarray(np.asarray(trans)[perm]),
        jnp.asarray(np.asarray(masks)[perm]),
    )


def plan_window_buckets(counts, nbuckets=8, round_to=8192, max_window=None):
    """Group frames into window-size classes for right-sized scans.

    The culled scan's scatter cost is linear in its static window length M
    (measured 7-9 ns/update regardless of table size or sortedness), and
    per-frame visible-window counts vary ~3.6x across a session — so running
    ONE scan at max(counts) wastes ~45% of the scatter volume. This sorts
    frames by window count, splits them into `nbuckets` equal-frame groups,
    and sizes each group's scan to its own maximum (rounded to `round_to`).

    Args:
      counts: [F] per-frame window point counts (build_view_index's
        last_window_counts diagnostic).
      nbuckets: number of size classes.
      round_to: window length granularity (compile-shape stability).
      max_window: clamp for every bucket window (pass the single-M kernel's
        M so per-bucket windows never exceed the order_ext extension).

    Returns:
      perm: [F] int64 frame permutation (group frames contiguously by bucket;
        apply to starts/quats/translations/masks before the bucketed kernel).
      sizes: list of per-bucket frame counts (sum == F).
      Ms: list of per-bucket static window lengths (same length as sizes).
    """
    counts = np.asarray(counts)
    F = len(counts)
    order = np.argsort(counts, kind="stable")
    edges = [round(i * F / nbuckets) for i in range(nbuckets + 1)]
    perm, sizes, Ms = [], [], []
    for a, b in zip(edges[:-1], edges[1:]):
        if a >= b:
            continue
        grp = order[a:b]
        Mk = int(-(-int(counts[grp].max()) // round_to) * round_to)
        if max_window is not None:
            Mk = min(Mk, int(max_window))
        perm.extend(grp.tolist())
        if Ms and Ms[-1] == Mk:
            sizes[-1] += len(grp)
        else:
            Ms.append(Mk)
            sizes.append(len(grp))
    return np.asarray(perm, np.int64), sizes, Ms


def tpu_label_fuse_culled_bucketed(
    npts, nclasses, hw, Ms, sizes, threshold=0.5, use_pallas_hist=None,
    id_bits=20,
):
    """Bucketed culled label fusion: one right-sized scan per window-size
    class (plan_window_buckets), then ONE classification over the
    concatenated winner-class matrix — the class histogram is
    frame-order-invariant, so the bucket permutation needs no undo.

    Call with frame arrays (starts, quats, trans, masks) permuted by
    plan_window_buckets' perm. Classification runs the Pallas counting
    kernel on TPU (ops/histogram.py; rows padded to the kernel's lane
    tile) and the XLA row-sort path elsewhere. Clouds beyond 2^20 points
    use the gid-range-sharded z-buffer (same exact tie spec, see
    tpu_label_fuse_culled_big).
    """
    import jax
    import jax.numpy as jnp

    from fusion3dseg_tpu.geometry import camera
    from fusion3dseg_tpu.ops.zbuffer import (
        INT32_MAX, lex_combine_gid_sharded, packed_pmin, packed_pmin_gid_sharded,
    )

    h, w = hw
    INVALID = 255
    ID_BITS = id_bits
    NSUB = -(-npts // (1 << ID_BITS))
    if use_pallas_hist is None:
        use_pallas_hist = jax.devices()[0].platform == "tpu"
    TILE_N = 512
    npad = -(-npts // TILE_N) * TILE_N if use_pallas_hist else npts

    @jax.jit
    def run(points_ext, ids_ext, starts, K, quats, trans, masks):
        Cs = []
        o = 0
        for Mk, sz in zip(Ms, sizes):
            sl = slice(o, o + sz)
            o += sz

            def step(_, frame, Mk=Mk):
                start, q, t, mask = frame
                pts = jax.lax.dynamic_slice(points_ext, (start, 0), (Mk, 3))
                ids = jax.lax.dynamic_slice(ids_ext, (start,), (Mk,))
                u, v, z = camera.project_points(pts, K, q, t)
                if NSUB == 1:
                    pmin = packed_pmin(u, v, z, ids, jnp.ones_like(z, bool),
                                       h, w, id_bits=ID_BITS)
                    win_id = pmin & ((1 << ID_BITS) - 1)
                    has = pmin != INT32_MAX
                else:
                    pmin_sub = packed_pmin_gid_sharded(
                        u, v, z, ids, jnp.ones_like(z, bool), h, w, NSUB,
                        id_bits=ID_BITS,
                    )
                    win_id, has = lex_combine_gid_sharded(
                        pmin_sub, id_bits=ID_BITS,
                        z_bits=min(11, 31 - ID_BITS),
                    )
                row = jnp.full((npad,), INVALID, jnp.uint8)
                row = row.at[jnp.where(has, win_id, npad)].set(
                    mask.astype(jnp.uint8), mode="drop"
                )
                return None, row

            _, Ck = jax.lax.scan(
                step, None, (starts[sl], quats[sl], trans[sl], masks[sl])
            )
            Cs.append(Ck)
        C = Cs[0] if len(Cs) == 1 else jnp.concatenate(Cs, axis=0)
        if use_pallas_hist:
            from fusion3dseg_tpu.ops.histogram import histogram_classify_tpu

            (total, vmax), classes = histogram_classify_tpu(
                C, nclasses, threshold, tile_n=TILE_N
            )
            return (total[:npts], vmax[:npts]), classes[:npts]
        return _histogram_classify(C, nclasses, threshold)

    return run


def tpu_label_fuse_culled(npts, nclasses, hw, M, threshold=0.5):
    """Culled variant of the fused kernel: each frame z-buffers only its
    view-index slice of M points (see build_view_index). Winner packing uses
    ORIGINAL point ids, so tie-breaks and vote attribution match the
    uncull/oracle spec exactly."""
    import jax
    import jax.numpy as jnp

    from fusion3dseg_tpu.geometry import camera
    from fusion3dseg_tpu.ops.zbuffer import INT32_MAX, packed_pmin

    h, w = hw
    INVALID = 255
    ID_BITS = 20
    assert npts < (1 << ID_BITS)

    @jax.jit
    def run(points_ext, ids_ext, starts, K, quats, trans, masks):
        def step(_, frame):
            start, q, t, mask = frame
            pts = jax.lax.dynamic_slice(points_ext, (start, 0), (M, 3))
            ids = jax.lax.dynamic_slice(ids_ext, (start,), (M,))
            u, v, z = camera.project_points(pts, K, q, t)
            pmin = packed_pmin(u, v, z, ids, jnp.ones_like(z, bool), h, w,
                               id_bits=ID_BITS)
            win_id = pmin & ((1 << ID_BITS) - 1)
            has = pmin != INT32_MAX
            cls_row = jnp.full((npts,), INVALID, jnp.uint8)
            cls_row = cls_row.at[jnp.where(has, win_id, npts)].set(
                mask.astype(jnp.uint8), mode="drop"
            )
            return None, cls_row

        _, C = jax.lax.scan(step, None, (starts, quats, trans, masks))
        return _histogram_classify(C, nclasses, threshold)

    return run


def tpu_label_fuse_culled_big(npts, nclasses, hw, M, threshold=0.5,
                              shard_bits=20, z_bits=None,
                              use_pallas_hist=None):
    """Culled kernel for clouds beyond the 2^20 packed-id limit (single chip).

    The packed z-buffer is sharded by GID RANGE (ops/zbuffer.
    packed_pmin_gid_sharded): sub-buffer s owns point ids
    [s << shard_bits, (s+1) << shard_bits), every window point scatters into
    segment (gid >> shard_bits) * npix + pix in ONE segment_min (scatter
    cost is per-update, so the larger table is free), and the packed low
    bits ARE the gid's low bits. Depth ties therefore resolve by GLOBAL
    point id EXACTLY — intra-sub by the packed id, cross-sub by the
    arithmetic lexicographic (depth, gid) combine — matching the 2^20-id
    kernels and the oracle spec bit-for-bit, with no gathers and no
    M % 2^shard_bits constraint.

    This is the single-chip 10M-point path (BASELINE config 5's scale; the
    multi-chip variant is parallel/label_fuse.label_fuse_sharded_points).
    """
    import jax
    import jax.numpy as jnp

    from fusion3dseg_tpu.geometry import camera
    from fusion3dseg_tpu.ops.zbuffer import (
        INT32_MAX, lex_combine_gid_sharded, packed_pmin_gid_sharded,
    )

    h, w = hw
    INVALID = 255
    # same 11-bit depth spec as the 2^20-id kernels; must fit 31 - shard_bits
    zb = min(z_bits if z_bits is not None else 11, 31 - shard_bits)
    NSUB = -(-npts // (1 << shard_bits))
    if use_pallas_hist is None:
        use_pallas_hist = jax.devices()[0].platform == "tpu"
    TILE_N = 512
    npad = -(-npts // TILE_N) * TILE_N if use_pallas_hist else npts

    @jax.jit
    def run(points_ext, ids_ext, starts, K, quats, trans, masks):
        def step(_, frame):
            start, q, t, mask = frame
            pts = jax.lax.dynamic_slice(points_ext, (start, 0), (M, 3))
            ids = jax.lax.dynamic_slice(ids_ext, (start,), (M,))
            u, v, z = camera.project_points(pts, K, q, t)
            pmin_sub = packed_pmin_gid_sharded(
                u, v, z, ids, jnp.ones_like(z, bool), h, w, NSUB,
                id_bits=shard_bits, z_bits=zb,
            )
            win_gid, has = lex_combine_gid_sharded(
                pmin_sub, id_bits=shard_bits, z_bits=zb
            )
            cls_row = jnp.full((npad,), INVALID, jnp.uint8)
            cls_row = cls_row.at[jnp.where(has, win_gid, npad)].set(
                mask.astype(jnp.uint8), mode="drop"
            )
            return None, cls_row

        _, C = jax.lax.scan(step, None, (starts, quats, trans, masks))
        if use_pallas_hist:
            from fusion3dseg_tpu.ops.histogram import histogram_classify_tpu

            (total, vmax), classes = histogram_classify_tpu(
                C, nclasses, threshold, tile_n=TILE_N
            )
            return (total[:npts], vmax[:npts]), classes[:npts]
        return _histogram_classify(C, nclasses, threshold)

    return run


def _histogram_classify(C, nclasses, threshold):
    """Batched row-sort + run-length histogram of the [F, N] class matrix."""
    import jax
    import jax.numpy as jnp

    INVALID = 255
    S = jnp.sort(C.T, axis=-1)  # [N, F]; INVALID at the end
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    valid = S != INVALID
    total = jnp.sum(valid, axis=-1)
    start = jnp.concatenate(
        [jnp.ones((S.shape[0], 1), bool), S[:, 1:] != S[:, :-1]], axis=-1
    )
    run_start = jax.lax.cummax(jnp.where(start, rows_idx, 0), axis=1)
    run_len = jnp.where(valid, rows_idx - run_start + 1, 0)
    vmax = jnp.max(run_len, axis=-1)
    pos = jnp.argmax(run_len, axis=-1)
    cls_at = jnp.take_along_axis(S, pos[:, None], axis=-1)[:, 0].astype(jnp.int32)
    confident = (total > 0) & (vmax > 0) & (
        vmax / jnp.maximum(total, 1) >= threshold
    )
    classes = jnp.where(confident, cls_at, nclasses)
    return (total, vmax), classes




def tpu_label_fuse(npts, nclasses, hw, threshold=0.5):
    """Build the jitted fused label-fusion program.

    TPU-native design: per frame, project + z-buffer-win (one segment_min)
    and GATHER the winning pixel's mask class per point — emitting a
    [frames, npts] uint8 class matrix instead of scattering votes. The final
    histogram/argmax/threshold runs as one batched row-sort + vectorized
    run-length statistics. Rationale: XLA scatter throughput into a large
    [npts, nclasses] votes table is ~1M updates/s on TPU (measured), while
    batched sorts and elementwise scans run at memory bandwidth — this
    formulation removes every large-table scatter from the hot path.
    """
    import jax
    import jax.numpy as jnp

    from fusion3dseg_tpu.geometry import camera
    from fusion3dseg_tpu.ops.zbuffer import INT32_MAX, packed_pmin

    h, w = hw
    INVALID = 255  # sorts after every real class id
    # packed z-buffer entry (ops/zbuffer.packed_pmin): 11-bit quantized depth
    # (4.9 mm over 10 m) in the high bits, 20-bit point id in the low bits ->
    # ONE segment_min yields both the winning depth and the winning point per
    # pixel, and the winner extraction happens pixel-side (49k-element ops)
    # instead of per-point gathers (1M-element random access, the measured
    # XLA bottleneck).
    ID_BITS = 20
    assert npts < (1 << ID_BITS), "packed z-buffer supports < 1M points; shard beyond"

    @jax.jit
    def run(points, K, quats, trans, masks):
        ids = jax.lax.broadcasted_iota(jnp.int32, (npts, 1), 0)[:, 0]

        def step(_, frame):
            q, t, mask = frame
            u, v, z = camera.project_points(points, K, q, t)
            pmin = packed_pmin(u, v, z, ids, jnp.ones_like(z, bool), h, w,
                               id_bits=ID_BITS)
            win_id = pmin & ((1 << ID_BITS) - 1)
            has = pmin != INT32_MAX
            cls_row = jnp.full((npts,), INVALID, jnp.uint8)
            cls_row = cls_row.at[jnp.where(has, win_id, npts)].set(
                mask.astype(jnp.uint8), mode="drop"
            )
            return None, cls_row

        _, C = jax.lax.scan(step, None, (quats, trans, masks))  # [F, N]
        return _histogram_classify(C, nclasses, threshold)

    return run


