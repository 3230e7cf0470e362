"""Deterministic voxel sparsification (frame point-cloud downsampling).

Capability parity with reference Fusion.patch_downsample
(fusion.py:134-210): sparsify one frame's dense depth point cloud by merging
points within `radius` of each other with consistent surface normals
(cos > min_cosine); merged clusters become their mean position/color/normal,
with nmerges counters and a pixel->sparse-point `uv2pt` lookup.

The reference visits points in np.random.shuffle order and greedily grows
patches (fusion.py:172-208) — sequential and nondeterministic. TPU re-design
(SURVEY.md §7.1): group pixels by WORLD voxel of side `radius` and take
segment means per voxel:

  * voxel membership bounds the full Euclidean merge criterion (intra-cell
    distance <= sqrt(3)*radius; the reference's greedy balls have diameter
    up to 2*radius around the seed, so cluster scales match) — an earlier
    (image-patch, depth-bin) formulation bounded only depth and over-merged
    xy at range;
  * a two-pass normal split assigns points whose normal disagrees with the
    voxel mean (cos <= min_cosine) to a secondary cell, preserving the
    normal-cone criterion across creases.

Implementation: per-frame voxel coordinates -> one 3-key lexicographic sort
of H*W pixels -> dense run ids by prefix sum -> segment means with a STATIC
2*H*W segment bound. No capacity-sized tables, no linearized voxel key (so
no int32-overflow regime at any FOV/extent), fully deterministic,
O(H*W log H*W) per frame. Parity with the reference is statistical by
design (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion3dseg_tpu.ops.zbuffer import INT32_MAX


class SparsifyResult(NamedTuple):
    """Padded per-cell sparsified frame. Slots with count == 0 are empty."""

    points: jax.Array  # [C, 3] cell mean positions
    normals: jax.Array  # [C, 3] cell mean unit normals
    colors: jax.Array  # [C, 3] cell mean colors
    counts: jax.Array  # [C] int32 points merged per cell (= nmerges)
    cell_of_pixel: jax.Array  # [H*W] int32 cell slot per pixel, -1 invalid
    num_cells: int  # static C


class MergeResult(NamedTuple):
    """Padded weighted voxel merge of an arbitrary point set."""

    points: jax.Array  # [C, 3] weighted cell mean positions
    normals: jax.Array  # [C, 3] cell mean unit normals (weighted sum, renorm)
    colors: jax.Array  # [C, 3] weighted cell mean colors
    counts: jax.Array  # [C] int32 total weight per cell
    occurences: jax.Array  # [C] int32 summed occurrence counters per cell
    cell_of_input: jax.Array  # [N] int32 cell slot per input row, -1 invalid
    num_cells: int  # static C = 2 * N


def voxel_merge(
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    weights: jax.Array,
    occurences: jax.Array,
    valid: jax.Array,
    radius: float,
    min_cosine: float,
    extent_cells: int | None = None,
    max_cells: int | None = None,
    max_rows: int | None = None,
    origin_shift: jax.Array | None = None,
) -> MergeResult:
    """Weight-aware voxel merge of an arbitrary point set (the cross-chunk
    combiner behind the sharded fusion engine, and the kernel inside
    patch_sparsify).

    `max_cells` (static): bound the scatter working tables to max_cells
    rows when the input is expected to group into at most max_cells // 2
    voxels (physically: visible surface / radius² per frame — ~29k voxels
    for a 520-px-focal VGA frame at max_depth 8 m, radius 5 cm). Results
    and cell numbering are IDENTICAL to the unbounded path; inputs that
    do overflow fall back to the exact big tables via lax.cond at runtime
    (both branches compiled, one executed). Output shapes are unchanged
    (C = 2 * N padded slots) either way.

    `max_rows` (static): bound the per-row grouping work to the first
    max_rows SORTED rows when at most max_rows input rows are expected to
    be valid (the fusion engine's steady-state leftover is a small
    fraction of the frame). The sort routes valid keys ahead of the
    sentinel, so all valid rows live in the sorted prefix; every
    post-sort pass (row gather, normal-split scatter, aggregate scatter,
    per-row cell map) then runs at max_rows rank instead of N. Same
    lax.cond overflow contract as max_cells: more valid rows than the
    bound falls back to the full-rank tail. Unlike max_cells, the
    bounded branch accumulates normal sums in SORTED-row order while the
    full branch uses original order, so results agree within f32
    rounding; a row whose normal agreement sits exactly at min_cosine
    can flip its secondary-split cell between branches (measure-zero;
    see _prefix).

    Groups valid rows by world voxel of side `radius` (3-key lexicographic
    sort — no linearized key, no int32 overflow regime), splits each voxel's
    normal-cone outliers (cos <= min_cosine vs the voxel's weighted mean
    normal) into a secondary cell, and emits weighted means with summed
    weight/occurrence counters. Weights carry merge multiplicity (nmerges)
    so re-merging sparse buffers keeps running means exact up to voxel
    re-binning.

    `extent_cells` (static): when the caller can bound the point extent to
    < extent_cells voxels per axis (a single depth-culled frame spans at
    most 2*max_depth/radius), the three sort keys pack into ONE int32 in
    the same lexicographic order and the 4-operand sort becomes a
    2-operand sort — identical grouping, identical cell numbering, the
    sort is the per-frame cost center at VGA+ resolutions. Falls back to
    the 3-key sort when the packed key would not fit 31 bits. A valid
    point OUTSIDE the promised extent (an out-of-contract input, e.g. a
    validity range wider than the bound) is DROPPED — treated as invalid
    for this merge — rather than clamped into a boundary voxel where it
    would average with physically distant geometry.
    """
    N = points.shape[0]
    C = 2 * N

    big = jnp.float32(3.0e38)
    pmin = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    if origin_shift is not None:
        # shift the GRID (not the points): the grid anchors at the
        # valid-point min, so shifting the points is a no-op up to f32
        # rounding — callers that need a differently-phased grid (the
        # dedup repair's shifted passes) move the anchor instead.
        # origin_shift must be in [0, radius) per axis to keep vox >= 0.
        pmin = pmin - jnp.asarray(origin_shift, jnp.float32)
    vox = jnp.floor((points - pmin) / radius).astype(jnp.int32)
    vox = jnp.maximum(vox, 0)

    bits = 0
    if extent_cells is not None and extent_cells > 0:
        bits = max(1, (int(extent_cells) - 1).bit_length())
        if 3 * bits > 31:
            bits = 0  # extent too wide for a packed int32 key

    ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    if bits:
        # Out-of-contract robustness: the grid anchors at the valid-point
        # min corner, so one stray valid point at the min corner would
        # otherwise push the whole in-contract bulk past the extent bound
        # and mass-drop it (keeping only the outlier). When — and only
        # when — an axis overflows the bound, recentre that axis' window
        # on the integer mean of the valid voxel coords (bulk-dominated);
        # the shift is a whole number of cells, so grouping and ordering
        # are unchanged, and for in-contract inputs the shift is 0 —
        # bit-identical to the 3-key path.
        nvalid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        vmean = jnp.clip(
            jnp.sum(jnp.where(valid[:, None], vox, 0).astype(jnp.float32),
                    axis=0) / nvalid,
            0, float(1 << 30),
        ).astype(jnp.int32)
        vmax = jnp.max(jnp.where(valid[:, None], vox, 0), axis=0)
        shift = jnp.where(
            vmax < (1 << bits), 0,
            jnp.maximum(vmean - (1 << (bits - 1)), 0),
        )
        rel = vox - shift[None, :]
        in_extent = jnp.all((rel >= 0) & (rel < (1 << bits)), axis=1)
        rel = jnp.clip(rel, 0, (1 << bits) - 1)
        packed = (rel[:, 0] << (2 * bits)) | (rel[:, 1] << bits) | rel[:, 2]
        packed = jnp.where(valid & in_extent, packed, INT32_MAX)
        valid = valid & in_extent
        sp, sidx = jax.lax.sort((packed, ids), num_keys=1)
        vs_sorted = sp != INT32_MAX
        newrun = jnp.concatenate(
            [jnp.ones((1,), bool), sp[1:] != sp[:-1]]
        ) & vs_sorted
    else:
        kx = jnp.where(valid, vox[:, 0], INT32_MAX)
        ky = jnp.where(valid, vox[:, 1], INT32_MAX)
        kz = jnp.where(valid, vox[:, 2], INT32_MAX)
        sx, sy, sz, sidx = jax.lax.sort((kx, ky, kz, ids), num_keys=3)
        vs_sorted = sx != INT32_MAX
        newrun = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
            ]
        ) & vs_sorted
    runid_sorted = jnp.cumsum(newrun.astype(jnp.int32)) - 1

    w = weights.astype(jnp.float32)
    occ_f = occurences.astype(jnp.float32)
    # one [N,11] elementwise concat (bandwidth-cheap), then ONE row gather
    # into sorted order per tail — every per-row serialized pass below runs
    # on the sorted prefix. The occurrence counters ride as f32: their
    # per-cell sums are bounded by the session frame count << 2^24, so the
    # round-trip is exact.
    rows = jnp.concatenate(
        [w[:, None], occ_f[:, None], points, colors, normals], axis=1
    )

    def _full(R: int):
        """Normal-split + fused aggregate over ALL N rows in ORIGINAL row
        order with [R]/[2R]-row scatter tables.

        R == N is the exact unconditional path; R < N requires every run
        id < R — the caller guards with lax.cond on the run count.
        Original-order scattering costs one [N] run-id scatter but skips
        the [N,11] sorted-row gather and the rank-N cell-map scatter the
        prefix variant pays (gathers serialize per row too — the r4 VGA
        probe measured the gather formulation at full rank 5 ms/frame
        SLOWER than this one). Motivation for R < N (measured): scatter
        cost grows with TABLE HEIGHT (3.4 ms into [16k,11] vs 14.7 ms
        into [307k,11], same 307k updates — the non-aliased table leaves
        VMEM and XLA copies it through a transposed layout).
        """
        seg_of_row = jnp.zeros((N,), jnp.int32).at[sidx].set(runid_sorted)
        ok = valid & (seg_of_row >= 0)
        # invalid rows drop-route (index R/2R is OOB) rather than
        # accumulating into a trash segment — one hot segment serializes
        # its RMW chain (docs/DESIGN.md r3 probes)
        seg0 = jnp.where(ok, seg_of_row, R)
        nsum = jnp.zeros((R, 3), jnp.float32).at[seg0].add(
            normals * w[:, None], mode="drop"
        )
        nmean = nsum / jnp.maximum(
            jnp.linalg.norm(nsum, axis=-1, keepdims=True), 1e-12
        )
        agree = jnp.einsum(
            "nc,nc->n", normals, nmean[jnp.clip(seg0, 0, R - 1)],
            precision="highest",
        )
        secondary = (agree <= min_cosine) & ok
        seg = jnp.where(ok, seg_of_row * 2 + secondary.astype(jnp.int32),
                        2 * R)
        payload = jnp.concatenate(
            [rows[:, :2], rows[:, 2:] * w[:, None]], axis=1
        )
        acc = jnp.zeros((2 * R, 11), jnp.float32).at[seg].add(
            payload, mode="drop"
        )
        if R < N:
            # pad to the contract shape: cell ids are identical to the
            # exact path (< 2R by the guard), rows beyond stay zero
            acc = jax.lax.dynamic_update_slice(
                jnp.zeros((C, 11), jnp.float32), acc, (0, 0)
            )
        return acc, jnp.where(seg < 2 * R, seg, C)

    def _prefix(L: int, R: int):
        """Normal-split + fused aggregate over the first L < N SORTED rows
        with [R]/[2R]-row scatter tables.

        Requires every valid row to land in the sorted prefix of length L
        (nvalid <= L) — the caller guards with lax.cond on the valid
        count. The sort routes valid keys ahead of the sentinel, so the
        one [L,11] row gather puts every per-row serialized pass below at
        rank L instead of N — this is what removes the [N]-rank passes
        from the engine's steady-state frame (leftover is a small
        fraction of the frame once coverage builds). NOTE: this variant
        accumulates in sorted-row order while _full accumulates in
        original order, so overflow-branch selection can move the f32
        cell sums within rounding. Counts and cell ids match too, EXCEPT
        for the measure-zero case of a row whose normal agreement lands
        exactly on min_cosine: the `agree <= min_cosine` secondary-split
        test reads the f32 normal sum, so a different summation order can
        flip that row's cell assignment (consumers tolerate ~1e-6 on the
        sums and never depend on threshold-exact splits).
        """
        sl = slice(0, L)
        sidx_l, run_l, vs_l = sidx[sl], runid_sorted[sl], vs_sorted[sl]
        rows_l = rows[sidx_l]
        w_l = rows_l[:, 0]
        nrm_l = rows_l[:, 8:11]
        # invalid rows drop-route (index R/2R is OOB) rather than
        # accumulating into a trash segment — one hot segment serializes
        # its RMW chain (docs/DESIGN.md r3 probes)
        seg0_l = jnp.where(vs_l, run_l, R)
        nsum = jnp.zeros((R, 3), jnp.float32).at[seg0_l].add(
            nrm_l * w_l[:, None], mode="drop"
        )
        nmean = nsum / jnp.maximum(
            jnp.linalg.norm(nsum, axis=-1, keepdims=True), 1e-12
        )
        agree = jnp.einsum(
            "nc,nc->n", nrm_l, nmean[jnp.clip(seg0_l, 0, R - 1)],
            precision="highest",
        )
        secondary = (agree <= min_cosine) & vs_l
        seg_l = jnp.where(vs_l, run_l * 2 + secondary.astype(jnp.int32), 2 * R)
        # one fused [L,11] row scatter instead of five separate
        # segment_sums (scatter passes serialize per update)
        payload_l = jnp.concatenate(
            [rows_l[:, :2], rows_l[:, 2:] * w_l[:, None]], axis=1
        )
        acc = jnp.zeros((2 * R, 11), jnp.float32).at[seg_l].add(
            payload_l, mode="drop"
        )
        if R < N:
            # pad to the contract shape: cell ids are identical to the
            # exact path (< 2R by the guard), rows beyond stay zero
            acc = jax.lax.dynamic_update_slice(
                jnp.zeros((C, 11), jnp.float32), acc, (0, 0)
            )
        # per-row cell map back at original rank; untouched rows (possible
        # only under L < N, where they are all invalid) keep C
        seg = jnp.full((N,), C, jnp.int32).at[sidx_l].set(
            jnp.where(seg_l < 2 * R, seg_l, C)
        )
        return acc, seg

    L = min(int(max_rows), N) if max_rows is not None and max_rows > 0 else N
    R = min(int(max_cells) // 2, N) if max_cells is not None \
        and 0 < max_cells < C else N
    nruns = runid_sorted[-1] + 1
    nvalid = jnp.sum(valid.astype(jnp.int32))

    # The two bounds decouple: a frame with more valid rows than L (e.g. a
    # window-starved fuse step whose leftover is most of the frame) must
    # NOT forfeit the small scatter tables too — its voxel count still
    # fits R (measured r4: the joint guard cost a starved VGA frame 31 ms
    # in the [N]-table tail vs 15 ms with tables still bounded). Overflow
    # of a bound selects the exact full-rank variant for that axis only;
    # the compiled program contains each needed tail, runtime executes one.
    def _pick_R(make_tail):
        if R < N:
            return jax.lax.cond(
                nruns > R, lambda: make_tail(N), lambda: make_tail(R)
            )
        return make_tail(N)

    if L < N:
        acc, seg = jax.lax.cond(
            nvalid > L,
            lambda: _pick_R(_full),
            lambda: _pick_R(lambda R_: _prefix(L, R_)),
        )
    else:
        acc, seg = _pick_R(_full)
    cnt, occ = acc[:, 0], acc[:, 1]
    psum, csum, n2sum = acc[:, 2:5], acc[:, 5:8], acc[:, 8:11]

    denom = jnp.maximum(cnt[:, None], 1e-12)
    mean_pts = (psum / denom)[:C]
    mean_clr = (csum / denom)[:C]
    mean_nrm = n2sum[:C]
    mean_nrm = mean_nrm / jnp.maximum(
        jnp.linalg.norm(mean_nrm, axis=-1, keepdims=True), 1e-12
    )
    counts = jnp.round(cnt[:C]).astype(jnp.int32)
    cell_of_input = jnp.where(seg < C, seg, -1).astype(jnp.int32)
    return MergeResult(
        mean_pts, mean_nrm, mean_clr, counts, occ[:C].astype(jnp.int32),
        cell_of_input, C,
    )


def patch_sparsify(
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    radius: float,
    min_cosine: float,
    extent_cells: int | None = None,
    max_cells: int | None = None,
    max_rows: int | None = None,
) -> SparsifyResult:
    """Sparsify one frame (dense pixel cloud -> per-voxel means).

    Args:
      points, normals, colors: [H*W, 3] row-major per-pixel data (points in
        WORLD coordinates).
      valid: [H*W] bool; invalid pixels don't contribute and map to cell -1.
      height, width: image geometry (static).
      radius: merge distance scale (= voxel side). (The reference's patch
        `stride` only bounded its greedy search and has no analog here.)
      min_cosine: normal-agreement threshold.
      extent_cells: static per-axis voxel-extent bound enabling the packed
        single-key sort (see voxel_merge); a depth-culled frame satisfies
        extent_cells = ceil(2 * max_depth / radius) + margin.
      max_cells: static bound on the scatter working-table height (see
        voxel_merge) — identical results, lax.cond fallback on overflow.
      max_rows: static bound on the number of VALID pixels (see
        voxel_merge) — identical results, lax.cond fallback on overflow;
        the fusion engine's steady-state leftover mask satisfies a small
        fraction of H*W.

    Returns:
      SparsifyResult with C = 2 * H * W padded cell slots (a frame produces
      at most one primary + one secondary cell per pixel).
    """
    HW = height * width
    ones = jnp.ones((HW,), jnp.int32)
    m = voxel_merge(points, normals, colors, ones, ones, valid, radius,
                    min_cosine, extent_cells=extent_cells,
                    max_cells=max_cells, max_rows=max_rows)
    return SparsifyResult(
        m.points, m.normals, m.colors, m.counts, m.cell_of_input, m.num_cells
    )


def compact_slots(counts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Compaction map for occupied cell slots.

    Returns:
      dest: [C] int32 — rank of each occupied slot among occupied slots
        (garbage where count == 0, mask with `occupied`).
      total: scalar int32 number of occupied slots.
    """
    occupied = counts > 0
    dest = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    return jnp.where(occupied, dest, -1), jnp.sum(occupied.astype(jnp.int32))
