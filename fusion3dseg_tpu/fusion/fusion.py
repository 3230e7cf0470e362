"""Multi-view point-cloud fusion engine (COLMAP-style, TPU-native).

Capability parity with reference Fusion3DSeg/fusion.py (class Fusion,
:80-407): incrementally fuse per-frame RGB-D point clouds into one sparse
world cloud under a distance + normal-cone merge criterion, maintaining
nmerges / occurences counters and per-frame pixel->sparse-point `uv2pt`
lookups (the artifact consumed by voting, SURVEY.md §1).

Re-design (SURVEY.md §7.1-7.2). The reference's fuse loop is three nested
Python loops (per frame / per projected sparse point / per patch pixel,
fusion.py:212-324) with np.random.shuffle visit order. Here one frame step is
a single fused XLA program and the session is a lax.scan over frames:

  1. frustum + far-plane culling of the sparse buffer — one [N,5] half-space
     einsum (reference fusion.py:254-260);
  2. sparse -> pixel projection — one [N,3]x[3,3] matmul (camera.py);
  3. candidate assignment — sparse points z-buffered into a fine pixel-cell
     grid (two depth-ordered candidates per cell); every dense pixel gathers
     its 3x3 neighborhood's candidates and merges with the nearest one
     passing dist<radius & cos>min_cosine (the reference's criterion,
     fusion.py:165-170, evaluated for all pixels at once instead of greedy
     patch order);
  4. merge — segment-sum means into the sparse buffer: running mean of
     position/color/normal, nmerges += matches, occurences += 1 for touched
     slots (reference fusion.py:288-298 semantics);
  5. leftovers — unmatched pixels voxel-sparsified at the merge radius
     (ops/sparsify.py) and appended by prefix-sum compaction into the
     fixed-capacity buffer.

The sparse cloud lives in a static-capacity padded buffer (XLA static
shapes); `n` tracks the live prefix. Determinism: no shuffle — parity with
the reference is statistical (>=99.9% label agreement after voting), per
SURVEY.md §7 hard part (a).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.geometry import camera, intersections
from fusion3dseg_tpu.ops import sparsify, zbuffer
from fusion3dseg_tpu.ops.zbuffer import INT32_MAX


class FusionState(NamedTuple):
    points: jax.Array  # [CAP, 3]
    normals: jax.Array  # [CAP, 3]
    colors: jax.Array  # [CAP, 3]
    nmerges: jax.Array  # [CAP] int32
    occurences: jax.Array  # [CAP] int32
    n: jax.Array  # scalar int32 — live prefix length


def _empty_state(capacity: int) -> FusionState:
    z3 = jnp.zeros((capacity, 3), jnp.float32)
    zi = jnp.zeros((capacity,), jnp.int32)
    return FusionState(z3, z3, z3, zi, zi, jnp.int32(0))


def _append_sparsified(
    state: FusionState, sp: sparsify.SparsifyResult, capacity: int
) -> Tuple[FusionState, jax.Array]:
    """Append occupied sparsify cells to the buffer; returns (state, cell->slot map)."""
    C = sp.counts.shape[0]
    dest_rank, total_new = sparsify.compact_slots(sp.counts)
    occupied = sp.counts > 0
    dest = jnp.where(occupied, state.n + dest_rank, capacity)  # capacity = dropped
    fits = dest < capacity
    write = occupied & fits
    dest = jnp.where(write, dest, capacity)

    # Two append strategies, chosen STATICALLY by capacity (measured
    # crossover, r3 controlled A/B at window 32768: scatter 99.8 fps vs
    # staged 87.4 at 128k cap; staged 82.7 vs scatter 58.6 at 1M cap):
    #
    # - scatter: two fused row scatters straight into the [capacity,*]
    #   state (one [C,9] float, one [C,2] counters kept int32 end-to-end —
    #   a float carry would silently round nmerges beyond 2^24 on
    #   multi-thousand-frame sessions). XLA copies the non-aliased buffer
    #   through a transposed layout, so this pass is O(capacity) per
    #   frame, not O(updates) — fine at small capacities, 4.1+3.8
    #   ms/frame at 1M (r3 profile).
    # - staged: appends land in the contiguous range [n, n+total_new), so
    #   stage-compact the rows into SMALL [S,*] buffers and commit with
    #   dynamic_update_slice at offset n (vectorized copies). The slice
    #   writes staging zeros into [n+total_new, n+S) — slots not yet
    #   live, rewritten by the exact slice that makes them live before
    #   any read. A lax.cond falls back to the scatter path when n + S
    #   would cross capacity or a seed-scale frame appends more than S
    #   cells, preserving drop-at-capacity semantics; the cond is also
    #   why small capacities avoid this path (it blocks carry donation
    #   and costs ~12% there).
    def scatter_append(_):
        combined = jnp.concatenate(
            [state.points, state.normals, state.colors], axis=1
        )
        combined = combined.at[dest].set(
            jnp.concatenate([sp.points, sp.normals, sp.colors], axis=1),
            mode="drop",
        )
        counters = jnp.stack([state.nmerges, state.occurences], axis=1)
        counters = counters.at[dest].set(
            jnp.stack([sp.counts, jnp.ones_like(sp.counts)], axis=1),
            mode="drop",
        )
        return (combined[:, 0:3], combined[:, 3:6], combined[:, 6:9],
                counters[:, 0], counters[:, 1])

    if capacity <= (1 << 18):
        points, normals, colors, nmerges, occ = scatter_append(None)
    else:
        # staging-buffer budget: the slice commit writes S rows, so the
        # cond must fall back once n + S would cross capacity. Using the
        # padded sparsify size C (= 2*H*W) here would disable the fast
        # path for the last 2*H*W slots of fill — ~60% of a 1M buffer at
        # VGA — so stage into a smaller S and ALSO fall back in the (rare:
        # seed-scale frames append a few k cells) case total_new > S;
        # ranks >= S drop from staging, which is safe exactly because that
        # same cond routes those frames to the scatter path.
        S = min(C, 1 << 16)
        rank = jnp.where(write, dest_rank, S)
        stage_f = jnp.zeros((S, 9), jnp.float32).at[rank].set(
            jnp.concatenate([sp.points, sp.normals, sp.colors], axis=1),
            mode="drop",
        )
        stage_i = jnp.zeros((S, 2), jnp.int32).at[rank].set(
            jnp.stack([sp.counts, jnp.ones_like(sp.counts)], axis=1),
            mode="drop",
        )

        def staged_append(_):
            n0 = state.n
            return (
                jax.lax.dynamic_update_slice(
                    state.points, stage_f[:, 0:3], (n0, 0)
                ),
                jax.lax.dynamic_update_slice(
                    state.normals, stage_f[:, 3:6], (n0, 0)
                ),
                jax.lax.dynamic_update_slice(
                    state.colors, stage_f[:, 6:9], (n0, 0)
                ),
                jax.lax.dynamic_update_slice(
                    state.nmerges, stage_i[:, 0], (n0,)
                ),
                jax.lax.dynamic_update_slice(
                    state.occurences, stage_i[:, 1], (n0,)
                ),
            )

        points, normals, colors, nmerges, occ = jax.lax.cond(
            (state.n + S <= capacity) & (total_new <= S),
            staged_append, scatter_append, None,
        )
    n = jnp.minimum(state.n + total_new, capacity)

    cell2slot = jnp.where(write, dest, -1).astype(jnp.int32)
    return FusionState(points, normals, colors, nmerges, occ, n), cell2slot


def _frame_extent_cells(max_depth: float, radius: float) -> int:
    """Static per-axis voxel bound for ONE frame's point extent, enabling
    sparsify's packed single-key sort (ops/sparsify.voxel_merge). A frame's
    valid points lie within the caller's depth range of one camera, so the
    pairwise extent is <= 2x that range; 4*max_depth allows callers whose
    validity range reaches past `max_depth` (the engine only uses max_depth
    for sparse-side culling) up to 2*max_depth. Valid points beyond the
    bound are DROPPED by the sparsifier (not clamped); Fusion.fuse warns
    when point_range makes that possible. voxel_merge falls back to the
    exact 3-key sort when this bound does not fit a packed int32 key
    (e.g. very small radii)."""
    return int(np.ceil(4.0 * max_depth / radius)) + 3


def _sparsify_max_cells(npixels: int) -> int:
    """Scatter working-table bound for the per-frame sparsify (see
    ops/sparsify.voxel_merge max_cells): multi-column scatter cost grows
    with TABLE HEIGHT, not update count, and the unbounded [2*H*W, 11]
    grouping tables were the fuse step's dominant cost (r4 profile: 33 of
    61 ms/frame at VGA; bounding them measured 101.6 -> 129.7 fps at
    256x192 and 16.3 -> 22.0 fps at VGA, results identical).

    npixels // 2 cells = one distinct voxel per 4 pixels — frames whose
    mean voxel covers < 4 px (possible only when z_max approaches
    f * radius / 2) overflow to the exact big tables via lax.cond inside
    voxel_merge, so the bound is a fast path, never a correctness limit.
    Real sessions sit far inside it (a 520-px-focal VGA frame at
    max_depth 8 m, radius 5 cm peaks at ~29k voxels = 11 px/voxel; the
    bench's 256x192 seed frames occupy ~3.5k)."""
    return min(1 << 17, max(npixels // 2, 1 << 12))


def _sparsify_max_rows(npixels: int) -> int:
    """Sorted-prefix bound for the per-frame sparsify's VALID-row count
    (ops/sparsify.voxel_merge max_rows): the steady-state leftover mask —
    valid pixels that failed to merge — is a small fraction of the frame
    once coverage builds (the engine's ~25:1 sparsification), so the
    post-sort per-row passes run at npixels // 4 rank. Early frames with
    leftover above the bound lax.cond-overflow to the exact full-rank
    tail (identical results, r4-measured ~2x tail cost) — a handful of
    frames per session, never a correctness limit."""
    return min(1 << 17, max(npixels // 4, 1 << 12))


def _seed_frame(
    state: FusionState,
    fpts, fnrm, fclr, fvalid,
    *, height, width, radius, min_cosine, max_depth, capacity,
) -> Tuple[FusionState, jax.Array]:
    """First frame: voxel-sparsify at the merge radius (the analog of the
    reference's seed patch_downsample, fusion.py:239-245; the voxel
    formulation has no separate `stride` axis — radius governs)."""
    sp = sparsify.patch_sparsify(
        fpts, fnrm, fclr, fvalid, height, width, radius, min_cosine,
        extent_cells=_frame_extent_cells(max_depth, radius),
        max_cells=_sparsify_max_cells(height * width),
    )
    state, cell2slot = _append_sparsified(state, sp, capacity)
    uv2pt = jnp.where(
        sp.cell_of_pixel >= 0,
        cell2slot[jnp.clip(sp.cell_of_pixel, 0, sp.num_cells - 1)],
        -1,
    ).astype(jnp.int32)
    return state, uv2pt


def _match_pixels(
    grid, slotg, fpts, fnrm, fvalid,
    *, height, width, half, radius, min_cosine,
):
    """Match every dense pixel against its 3x3 cell neighborhood's
    candidates (step 3b of the fuse step; shared with the spatially
    sharded engine, parallel/fusion.py).

    Args:
      grid: [gh, gw, 12] per-cell candidate data — 2 depth-ordered
        candidates x (position, normal), zeros where absent.
      slotg: [gh, gw, 2] candidate ids in the CALLER's id space, -1 absent.
      fpts, fnrm: [P, 3] dense frame points/normals; fvalid: [P] bool.

    Returns (match [P] id-or--1, matched [P] bool). Candidates live on the
    regular cell grid, so the per-pixel view is built with zero gathers at
    pixel rank (padded shifts + broadcast upsample; docs/DESIGN.md).
    Candidate-axis order (candidate-major, then the 3x3 offsets row-major)
    fixes argmin tie-breaks.
    """
    P = height * width
    gh, gw = grid.shape[:2]
    padg = jnp.pad(grid, ((1, 1), (1, 1), (0, 0))).reshape(gh + 2, gw + 2, 2, 6)
    pads = jnp.pad(slotg, ((1, 1), (1, 1), (0, 0)), constant_values=-1)
    # stack directly in candidate-major order (index = cand*9 + offset,
    # offsets row-major) — the tie-break order of the argmin below — so no
    # [P,·,·,6] transpose pass is needed after the pixel upsample (that
    # layout shuffle moved ~130 MB/frame at VGA)
    neigh = jnp.stack(
        [padg[dy : dy + gh, dx : dx + gw, c]
         for c in range(2) for dy in range(3) for dx in range(3)],
        axis=2,
    )  # [gh, gw, 18, 6]
    nslot = jnp.stack(
        [pads[dy : dy + gh, dx : dx + gw, c]
         for c in range(2) for dy in range(3) for dx in range(3)],
        axis=2,
    )  # [gh, gw, 18]
    # cell -> pixel upsample (pixel (v,u) reads cell (v//half, u//half))
    pixd = jnp.repeat(jnp.repeat(neigh, half, axis=0), half, axis=1)[:height, :width]
    pixs = jnp.repeat(jnp.repeat(nslot, half, axis=0), half, axis=1)[:height, :width]
    cpn = pixd.reshape(P, 18, 6)
    cand = pixs.reshape(P, 18)

    cmask = cand >= 0
    cpts, cnrm = cpn[..., :3], cpn[..., 3:]
    dist = jnp.linalg.norm(fpts[:, None, :] - cpts, axis=-1)
    cosn = jnp.sum(fnrm[:, None, :] * cnrm, axis=-1)
    passes = cmask & (dist < radius) & (cosn > min_cosine) & fvalid[:, None]
    dist = jnp.where(passes, dist, jnp.inf)
    best = jnp.argmin(dist, axis=-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    matched = jnp.any(passes, axis=-1)
    match = jnp.where(matched, cand[rows, best], -1)
    return match, matched


def _fuse_frame(
    state: FusionState,
    q, t, fpts, fnrm, fclr, fvalid,
    *, Ks, height, width, radius, min_cosine, max_depth, capacity,
    candidate_px, window: Optional[int] = None,
    window_policy: str = "newest",
) -> Tuple[FusionState, jax.Array, jax.Array]:
    """One fusion step: merge a new frame into the sparse buffer.
    Returns (state, uv2pt [H*W], span []) — span is the frame's
    frustum-visible slot span, the window-overflow telemetry.

    `window` (static) bounds the scatter/segment work to a dynamic W-slot
    slice of the buffer instead of all `capacity` slots (ROADMAP #10): the
    buffer is appended in view order, so one frame's visible slots cluster
    in a contiguous id range (same observation as the label-fuse view
    index). Projection + culling stay O(capacity) — those are cheap
    elementwise/matmul passes — while the z-buffer scatters and the merge
    segment-sums (the capacity-bound cost) shrink to O(window). Visible
    slots outside the window (span > window, e.g. at loop closure) miss
    their merge and re-append a duplicate — the same quality trade the
    reference makes with its frame-skip/decimation knobs; pick window >=
    the visible-span high-water mark (see visible_span_from_uv2pt) to
    avoid it entirely.

    `window_policy` (static) picks the slots covered when the visible span
    EXCEEDS the window (VERDICT r3 weak#4 — loop closure):
      - "newest": the newest W visible slots (freshly appended geometry
        re-matches most often; old geometry re-appends duplicates);
      - "split": a two-segment window — the OLDEST W//2 visible slots plus
        the newest W - W//2 — so revisited geometry merges against its
        original slots instead of duplicating. Locals stay monotone in
        global slot id (segment A starts at the oldest visible slot and
        precedes segment B), so the packed z-buffer's lowest-id tie-break
        is unchanged, and when the span fits in W the two segments are
        forced contiguous and the step is bit-identical to "newest".
    """
    if window_policy not in ("newest", "split"):
        raise ValueError(f"unknown window_policy {window_policy!r}")
    P = height * width
    # candidate-grid cell size in pixels: must track the SPARSE point
    # spacing (~radius in world units, a few px), not the reference's
    # search-patch stride — a coarse grid holds only 2 depth-ordered
    # candidates per cell and starves matching when many sparse points
    # share a cell
    half = candidate_px
    gh = -(-height // half)
    gw = -(-width // half)
    ncells = gh * gw

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    active = slot_ids < state.n

    # 1. frustum + far-plane culling of the sparse cloud (one [cap,5]
    # half-space einsum — the ONLY full-capacity pass in the windowed
    # path)
    plane_pts, plane_ns = camera.frustum_world_planes(
        Ks, width, height, q, t, max_depth
    )
    inter = intersections.points_inside_polyhedra(state.points, plane_pts, plane_ns)
    inter = inter & active

    # window selection: cover the visible slot range; if it exceeds W,
    # prefer the NEWEST slots (freshly appended geometry is the most likely
    # to re-match; old slots resurface only at loop closure). The range
    # comes from the frustum test ALONE — a conservative superset of
    # pixel-bounds visibility — so the full-capacity projection the old
    # path ran just to pick the window is gone (it cost ~1.4 ms/frame in
    # matmul passes plus ~4.7 ms/frame in [cap,3] layout-conversion
    # copies at 1M capacity; r3 profile). Superset semantics: window >=
    # the visible span covers every candidate the unwindowed merge would
    # consider (the true span is contained in the frustum span) — the
    # merge matches it up to depth-quantization granularity, since
    # id_bits tracks W, not capacity, so zbits and hence near-tie
    # winners can differ (test bar: 99% agreement).
    W = capacity if (window is None or window >= capacity) else int(window)
    vis = jnp.where(inter, slot_ids, capacity)
    minv = jnp.min(vis)
    maxv = jnp.max(jnp.where(inter, slot_ids, -1))
    # frustum-visible slot span — the engine's window-overflow telemetry
    # (VERDICT r4 #2): span > window means this frame's merge could not
    # cover every visible slot and duplicates may have been appended.
    # Free: minv/maxv come from the frustum test the windowed path
    # already runs. [] int32, 0 when nothing is visible.
    span = jnp.maximum(maxv - minv + 1, 0).astype(jnp.int32)
    if W < capacity:
        if window_policy == "split":
            # two segments: oldest Wa visible slots + newest Wb. b0 is
            # forced >= a0 + Wa so the segments never overlap (an
            # overlapping slot would double-merge); when the span fits in
            # W that clamp makes them contiguous == the "newest" window.
            Wa = W // 2
            Wb = W - Wa
            a0 = jnp.clip(minv, 0, capacity - W)
            b0 = jnp.clip(maxv - Wb + 1, a0 + Wa, capacity - Wb)
        else:
            # single segment preferring the newest visible slots
            Wa, Wb = 0, W
            b0 = jnp.clip(jnp.maximum(minv, maxv - W + 1), 0, capacity - W)
            a0 = b0

        def take_w(arr):
            """Gather the window working set (one or two segments)."""
            if arr.ndim == 2:
                a = jax.lax.dynamic_slice(arr, (a0, 0), (Wa, arr.shape[1]))
                b = jax.lax.dynamic_slice(arr, (b0, 0), (Wb, arr.shape[1]))
            else:
                a = jax.lax.dynamic_slice(arr, (a0,), (Wa,))
                b = jax.lax.dynamic_slice(arr, (b0,), (Wb,))
            return jnp.concatenate([a, b], axis=0) if Wa else b

        def put_w(dst, vals):
            """Scatter the working set back (segments are disjoint)."""
            if dst.ndim == 2:
                if Wa:
                    dst = jax.lax.dynamic_update_slice(dst, vals[:Wa], (a0, 0))
                return jax.lax.dynamic_update_slice(dst, vals[Wa:], (b0, 0))
            if Wa:
                dst = jax.lax.dynamic_update_slice(dst, vals[:Wa], (a0,))
            return jax.lax.dynamic_update_slice(dst, vals[Wa:], (b0,))

        def to_global(local):
            """Window-local id -> global slot id (monotone: segment A ids
            all precede segment B's, preserving lowest-id tie-breaks)."""
            if not Wa:
                return b0 + local
            return jnp.where(local < Wa, a0 + local, b0 - Wa + local)

        pts_w = take_w(state.points)
        nrm_w = take_w(state.normals)
        inter_w = take_w(inter)
        # 2. project ONLY the window working set into this frame
        u_w, v_w, z_w = camera.project_points(pts_w, Ks, q, t)
        ok_w = inter_w & (z_w > 0) & (u_w >= 0) & (u_w < width) \
            & (v_w >= 0) & (v_w < height)
    else:
        pts_w, nrm_w = state.points, state.normals
        # 2. project the whole (small) buffer into this frame
        u_w, v_w, z_w = camera.project_points(state.points, Ks, q, t)
        ok_w = inter & (z_w > 0) & (u_w >= 0) & (u_w < width) \
            & (v_w >= 0) & (v_w < height)

    # 3a. z-buffer sparse points into the coarse candidate grid. Packed
    # depth+slot single segment_min (one scatter instead of two — scatters
    # dominate at capacity ~1M; see ops/zbuffer.zbuffer_uv2pt_packed).
    # 11-bit depth quantization over max_depth (~5mm at 10m) only affects
    # which of several VERY close sparse points becomes the cell candidate.
    # W.bit_length() (not W-1) keeps one spare id value so a max-depth-bin
    # point in the last slot can never pack to INT32_MAX and alias the
    # empty-cell sentinel. Candidate ids below are WINDOW-LOCAL.
    id_bits = max(1, W.bit_length())
    zbits = 31 - id_bits
    cell = jnp.where(ok_w, (v_w // half) * gw + (u_w // half), ncells)
    if zbits >= 8:
        slot32 = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
        zq = jnp.clip(z_w * ((1 << zbits) / max_depth), 0, (1 << zbits) - 1).astype(jnp.int32)
        packed = (zq << id_bits) | slot32
        # drop-route culled points instead of a shared trash segment:
        # updates into one hot segment serialize on its RMW chain (7.9-9.2
        # ns/update at 33-95% invalid vs a flat 7.3 ns dropped; DESIGN.md)
        cell_drop = jnp.where(ok_w, cell, 2 * ncells)
        pmin = jnp.full((ncells,), INT32_MAX, jnp.int32).at[cell_drop].min(
            packed, mode="drop"
        )
        cand_of_cell = jnp.where(pmin == INT32_MAX, -1, pmin & ((1 << id_bits) - 1))
        # second candidate per cell: exclude the first winners and re-min.
        # A single candidate starves visible background points at occlusion
        # edges (they re-append duplicates every frame); two depth-ordered
        # candidates per cell x the 3x3 neighborhood gives 18 merge
        # candidates per pixel.
        cell_safe = jnp.clip(cell, 0, ncells - 1)
        is_winner = ok_w & (packed == pmin[cell_safe])
        cell2_drop = jnp.where(is_winner, 2 * ncells, cell_drop)
        pmin2 = jnp.full((ncells,), INT32_MAX, jnp.int32).at[cell2_drop].min(
            packed, mode="drop"
        )
        cand2_of_cell = jnp.where(
            pmin2 == INT32_MAX, -1, pmin2 & ((1 << id_bits) - 1)
        )
    else:
        # window too large for packed depth+slot int32 entries: fall back
        # to two scatter_argmin rounds (4 scatters instead of 2) so large-
        # capacity runs keep BOTH depth-ordered candidates per cell — a
        # single candidate starves matching (87% occurences==1, measured;
        # see the dual-candidate rationale above).
        zc = jnp.where(ok_w, z_w, jnp.inf)
        winner = zbuffer.scatter_argmin_by_segment(zc, cell, ncells + 1)[:ncells]
        cand_of_cell = jnp.where(winner == INT32_MAX, -1, winner)
        cell_safe = jnp.clip(cell, 0, ncells - 1)
        slot32 = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
        is_winner = ok_w & (slot32 == cand_of_cell[cell_safe])
        winner2 = zbuffer.scatter_argmin_by_segment(
            jnp.where(is_winner, jnp.inf, zc), cell, ncells + 1
        )[:ncells]
        cand2_of_cell = jnp.where(winner2 == INT32_MAX, -1, winner2)

    # 3b. every dense pixel reads candidates from its 3x3 cell neighborhood
    # (_match_pixels). Candidate data is gathered once per CELL (2*ncells
    # rows — ~20x fewer than the [P,18] row gather this replaces; gathers
    # serialize per row, docs/DESIGN.md).
    cands2 = jnp.stack([cand_of_cell, cand2_of_cell], axis=1)  # [ncells, 2]
    cmask_cell = cands2 >= 0
    csafe_cell = jnp.where(cmask_cell, cands2, 0)
    cdata = jnp.concatenate([pts_w, nrm_w], axis=1)[csafe_cell]  # [ncells, 2, 6]
    grid = jnp.where(cmask_cell[..., None], cdata, 0.0).reshape(gh, gw, 12)
    slotg = jnp.where(cmask_cell, cands2, -1).reshape(gh, gw, 2)
    match, matched = _match_pixels(
        grid, slotg, fpts, fnrm, fvalid, height=height, width=width,
        half=half, radius=radius, min_cosine=min_cosine,
    )  # [P] window-local slot or -1

    if W < capacity:
        clr_w = take_w(state.colors)
        nm_w = take_w(state.nmerges)
        occ_w = take_w(state.occurences)
    else:
        clr_w, nm_w, occ_w = state.colors, state.nmerges, state.occurences

    # 4. merge matched dense pixels into their sparse slots (running mean of
    #    this frame's matches + the current sparse value, fusion.py:288-295)
    # one fused [P,10] row-scatter instead of four separate segment_sums:
    # scatter passes serialize per update (docs/DESIGN.md), so batching the
    # count + position + color + normal accumulations into one pass cuts
    # the merge's scatter count 4x. Unmatched pixels (often the majority)
    # drop-route (index W is out of bounds for the [W,10] buffer) instead
    # of accumulating into a trash row — same update order, bit-identical
    # sums, no hot-segment serialization (DESIGN.md r3 probes).
    mseg = jnp.where(matched, match, W)
    acc = jnp.zeros((W, 10), jnp.float32).at[mseg].add(
        jnp.concatenate(
            [jnp.ones((fpts.shape[0], 1), jnp.float32), fpts, fclr, fnrm],
            axis=1,
        ),
        mode="drop",
    )
    cnt, spt, scl, snr = acc[:, 0], acc[:, 1:4], acc[:, 4:7], acc[:, 7:10]

    touched = cnt > 0
    denom = (cnt + 1.0)[:, None]
    new_pts = jnp.where(touched[:, None], (spt + pts_w) / denom, pts_w)
    new_clr = jnp.where(touched[:, None], (scl + clr_w) / denom, clr_w)
    nsum = snr + nrm_w
    nnrm = nsum / jnp.maximum(jnp.linalg.norm(nsum, axis=-1, keepdims=True), 1e-12)
    new_nrm = jnp.where(touched[:, None], nnrm, nrm_w)
    new_nm = nm_w + cnt.astype(jnp.int32)
    new_occ = occ_w + touched.astype(jnp.int32)
    if W < capacity:
        state = FusionState(
            put_w(state.points, new_pts),
            put_w(state.normals, new_nrm),
            put_w(state.colors, new_clr),
            put_w(state.nmerges, new_nm),
            put_w(state.occurences, new_occ),
            state.n,
        )
        match = jnp.where(matched, to_global(match), -1)  # global slot ids
    else:
        state = FusionState(new_pts, new_nrm, new_clr, new_nm, new_occ, state.n)

    # 5. leftover pixels -> voxel-sparsify at the merge radius and append
    #    (the analog of the reference's 2x-stride leftover downsample,
    #    fusion.py:306-320; here the voxel size — not a patch stride —
    #    controls cluster scale, and using the merge radius keeps appended
    #    leftovers mergeable on later frames)
    leftover = fvalid & jnp.logical_not(matched)
    sp = sparsify.patch_sparsify(
        fpts, fnrm, fclr, leftover, height, width, radius, min_cosine,
        extent_cells=_frame_extent_cells(max_depth, radius),
        max_cells=_sparsify_max_cells(height * width),
        max_rows=_sparsify_max_rows(height * width),
    )
    state, cell2slot = _append_sparsified(state, sp, capacity)

    uv2pt = jnp.where(matched, match, -1)
    lp = sp.cell_of_pixel
    uv2pt = jnp.where(
        jnp.logical_not(matched) & (lp >= 0),
        cell2slot[jnp.clip(lp, 0, sp.num_cells - 1)],
        uv2pt,
    ).astype(jnp.int32)
    return state, uv2pt, span


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "radius", "min_cosine", "max_depth",
        "capacity", "candidate_px", "window", "window_policy",
        "with_stats",
    ),
)
def fuse_session(
    Ks: jax.Array,  # [3,3] depth-scaled intrinsics
    quats_wxyz: jax.Array,  # [F,4]
    translations: jax.Array,  # [F,3]
    points: jax.Array,  # [F, H*W, 3] world points
    normals: jax.Array,  # [F, H*W, 3]
    colors: jax.Array,  # [F, H*W, 3]
    valid: jax.Array,  # [F, H*W] bool
    *,
    height: int,
    width: int,
    radius: float,
    min_cosine: float,
    max_depth: float,
    capacity: int,
    candidate_px: int = 1,
    window: Optional[int] = None,
    window_policy: str = "newest",
    with_stats: bool = False,
) -> Tuple[FusionState, jax.Array]:
    """Fuse a whole session in one compiled program.

    Frame 0 seeds the buffer (voxel sparsify at the merge radius); frames
    1..F-1 run the merge step under lax.scan. Returns (final state,
    uv2pt [F, H*W] int32); with `with_stats` (static) additionally
    returns spans [F] int32 — each frame's frustum-visible slot span
    (span[0] = 0 for the seed frame). A span above `window` is the
    engine's overflow signal: that frame's merge could not cover every
    visible slot and may have appended duplicates — feed the state
    through `dedup_state` (drivers do this automatically).

    Unlike the reference's fuse there is no `stride` argument: the voxel
    sparsifier works on world positions and the merge radius (the patch
    stride has no analog in the voxel formulation), and the per-pixel
    `depth` image is redundant with the world `points` (reference
    fusion.py:212-245 carries both).

    Caller contract: frame 0 should have at least one valid point (the
    reference scans forward for the first such frame, fusion.py:236-238 —
    do that on the host before calling).
    """
    state = _empty_state(capacity)
    kw = dict(
        height=height, width=width, radius=radius,
        min_cosine=min_cosine, max_depth=max_depth, capacity=capacity,
    )
    state, uv2pt0 = _seed_frame(
        state, points[0], normals[0], colors[0], valid[0], **kw
    )

    def step(state, frame):
        q, t, fp, fn, fc, fv = frame
        state, uv2pt, span = _fuse_frame(
            state, q, t, fp, fn, fc, fv, Ks=Ks,
            candidate_px=candidate_px, window=window,
            window_policy=window_policy, **kw,
        )
        return state, (uv2pt, span)

    state, (uv2pt_rest, spans) = jax.lax.scan(
        step,
        state,
        (
            quats_wxyz[1:], translations[1:], points[1:], normals[1:],
            colors[1:], valid[1:],
        ),
    )
    uv2pt = jnp.concatenate([uv2pt0[None], uv2pt_rest], axis=0)
    if with_stats:
        spans = jnp.concatenate([jnp.zeros((1,), jnp.int32), spans])
        return state, uv2pt, spans
    return state, uv2pt


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "radius", "min_cosine", "max_depth", "capacity",
        "candidate_px", "window", "window_policy", "with_stats",
    ),
)
def fuse_chunk(
    state: FusionState,
    Ks, quats_wxyz, translations, points, normals, colors, valid,
    *, height, width, radius, min_cosine, max_depth, capacity,
    candidate_px: int = 1, window: Optional[int] = None,
    window_policy: str = "newest", with_stats: bool = False,
) -> Tuple[FusionState, jax.Array]:
    """Continue fusion over a CHUNK of frames from an existing state.

    The building block of mid-scan checkpointing: fuse_session == seed +
    fuse_chunk over frames 1..F-1 in any chunking (the scan step is
    identical, so chunk boundaries do not change the math — resume is
    bit-exact). Returns (state, uv2pt [chunk, H*W]); `with_stats`
    (static) appends spans [chunk] — see fuse_session."""
    kw = dict(
        height=height, width=width, radius=radius,
        min_cosine=min_cosine, max_depth=max_depth, capacity=capacity,
    )

    def step(st, frame):
        q, t, fp, fn, fc, fv = frame
        st, uv2pt, span = _fuse_frame(
            st, q, t, fp, fn, fc, fv, Ks=Ks, candidate_px=candidate_px,
            window=window, window_policy=window_policy, **kw
        )
        return st, (uv2pt, span)

    state, (uv2pt, spans) = jax.lax.scan(
        step, state,
        (quats_wxyz, translations, points, normals, colors, valid),
    )
    if with_stats:
        return state, uv2pt, spans
    return state, uv2pt


def fuse_session_checkpointed(
    Ks, quats_wxyz, translations, points, normals, colors, valid,
    *, height, width, radius, min_cosine, max_depth, capacity,
    candidate_px: int = 1, window: Optional[int] = None,
    window_policy: str = "newest",
    chunk_frames: int = 64, ckpt_dir,
    max_chunks: Optional[int] = None, retries: int = 0,
    verbose: bool = False,
) -> Tuple[FusionState, np.ndarray]:
    """Checkpointed session fusion: scan in chunks, persist after each.

    The reference's only checkpointing is whole-stage artifacts (SURVEY.md
    §5); multi-thousand-frame sessions that die mid-fuse must restart from
    frame 0. Here the scan is segmented into `chunk_frames`-frame jitted
    chunks (one compile per distinct chunk length — at most two: full and
    remainder); after each chunk the FusionState (orbax) plus the chunk's
    uv2pt rows and a progress marker land in `ckpt_dir`. A rerun with the
    same ckpt_dir resumes from the marker BIT-EXACTLY (the chunked scan is
    the same op sequence as the one-shot fuse_session scan).

    Args mirror fuse_session (host or device arrays); `max_chunks` bounds
    how many chunks to run this call (for tests / cooperative yielding).
    `retries` re-runs a FAILED chunk from its committed predecessor state
    that many times before raising (elastic recovery for transient backend
    errors on long scans — the chunk is a pure function of the committed
    state, so a retry is bit-exact; SURVEY.md §5 failure-recovery slot).

    Returns (state, uv2pt [F, H*W] int32 numpy). If interrupted (max_chunks),
    returns the partial state and the uv2pt rows fused so far.
    """
    import json as _json
    from pathlib import Path

    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    marker = ckpt_dir / "progress.json"
    F = int(np.asarray(quats_wxyz).shape[0])
    kw = dict(height=height, width=width, radius=radius,
              min_cosine=min_cosine, max_depth=max_depth, capacity=capacity)
    # every parameter the scan math depends on — resuming under ANY changed
    # value would silently continue from state fused under the old one,
    # breaking the advertised bit-exactness (review finding r2)
    params = dict(
        nframes=F, capacity=capacity, height=height, width=width,
        radius=float(radius), min_cosine=float(min_cosine),
        max_depth=float(max_depth), candidate_px=candidate_px,
        window=None if window is None else int(window),
        window_policy=window_policy,
    )

    # Commit protocol: each chunk's state lands in its own state_<frame>
    # directory FIRST; the marker (naming that directory) is the single
    # commit point, written after, and stale state dirs are pruned only
    # after the marker update. A crash between state save and marker write
    # leaves the marker pointing at the previous state dir — which still
    # exists — so resume re-fuses the interrupted chunk exactly once
    # instead of re-applying a committed chunk to a post-chunk state.
    def _commit(state, next_frame):
        sdir = ckpt_dir / f"state_{next_frame:07d}"
        save_state(state, sdir)
        marker.write_text(_json.dumps(
            {"next_frame": next_frame, "state_dir": sdir.name, **params}
        ))
        for d in ckpt_dir.glob("state_*"):
            if d.name != sdir.name:
                import shutil

                shutil.rmtree(d, ignore_errors=True)

    if marker.is_file():
        prog = _json.loads(marker.read_text())
        bad = {
            k: (prog.get(k), v) for k, v in params.items()
            # pre-r3 markers recorded only nframes/capacity; missing keys
            # on those can't be validated, so only mismatches reject
            if k in prog and prog[k] != v
        }
        if bad:
            detail = ", ".join(
                f"{k} {old!r} vs {new!r}" for k, (old, new) in bad.items()
            )
            raise ValueError(
                f"checkpoint at {ckpt_dir} is for a different session or "
                f"parameterization ({detail}) — clear it first"
            )
        nxt = int(prog["next_frame"])
        # pre-versioning markers stored the state at the ckpt root
        state = load_state(ckpt_dir / prog["state_dir"]
                           if "state_dir" in prog else ckpt_dir)
        if verbose:
            print(f"resuming fusion at frame {nxt}/{F}")
    else:
        state, uv2pt0 = _seed_frame(
            state=_empty_state(capacity),
            fpts=jnp.asarray(points[0]), fnrm=jnp.asarray(normals[0]),
            fclr=jnp.asarray(colors[0]), fvalid=jnp.asarray(valid[0]), **kw,
        )
        np.save(ckpt_dir / "uv2pt_0000000.npy", np.asarray(uv2pt0[None]))
        _commit(state, 1)
        nxt = 1

    chunks_run = 0
    while nxt < F and (max_chunks is None or chunks_run < max_chunks):
        end = min(nxt + chunk_frames, F)
        sl = slice(nxt, end)
        attempt = 0
        while True:
            try:
                state_next, uv2pt_c = fuse_chunk(
                    state, jnp.asarray(Ks, jnp.float32),
                    jnp.asarray(quats_wxyz[sl]), jnp.asarray(translations[sl]),
                    jnp.asarray(points[sl]), jnp.asarray(normals[sl]),
                    jnp.asarray(colors[sl]), jnp.asarray(valid[sl]),
                    candidate_px=candidate_px, window=window,
                    window_policy=window_policy, **kw,
                )
                uv2pt_c = np.asarray(uv2pt_c)  # sync — surface async errors
                break
            except Exception as e:
                attempt += 1
                if attempt > retries:
                    raise
                if verbose:
                    print(f"chunk [{nxt}, {end}) failed "
                          f"({type(e).__name__}: {e}); retry "
                          f"{attempt}/{retries} from the last commit")
                import time as _time

                _time.sleep(2.0)
                # the failed call may have consumed/corrupted `state`
                # (donated buffers); reload the committed predecessor
                prog = _json.loads(marker.read_text())
                state = load_state(ckpt_dir / prog["state_dir"]
                                   if "state_dir" in prog else ckpt_dir)
        state = state_next
        np.save(ckpt_dir / f"uv2pt_{nxt:07d}.npy", uv2pt_c)
        _commit(state, end)
        if verbose:
            print(f"fused frames [{nxt}, {end}) -> n={int(np.asarray(state.n))}")
        nxt = end
        chunks_run += 1

    rows = []
    for f in sorted(ckpt_dir.glob("uv2pt_*.npy")):
        rows.append(np.load(f))
    uv2pt = np.concatenate(rows, axis=0) if rows else np.zeros((0,), np.int32)
    # a crash between a chunk's uv2pt save and its _commit leaves a stale
    # file past the committed frame count; trim so the returned rows never
    # cover frames the returned state has not fused (`nxt` is the frame
    # count of the LAST commit — this run's, or the resume marker's when
    # max_chunks caps the run at zero chunks)
    uv2pt = uv2pt[:nxt]
    return state, uv2pt


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "radius", "min_cosine", "max_depth", "capacity",
    ),
)
def fuse_sessions_batch(
    Ks, quats_wxyz, translations, points, normals, colors, valid,
    *, height, width, radius, min_cosine, max_depth, capacity,
    candidate_px: int = 1, window: Optional[int] = None,
    window_policy: str = "newest",
):
    """Fuse a BATCH of sessions in one program (vmap over the session axis).

    Every array carries a leading session axis: Ks [S,3,3], poses [S,F,...],
    frame data [S,F,HW,...]. Sessions fuse independently and concurrently —
    the multi-session scaling axis of BASELINE config 5 (each session's scan
    runs under vmap; shard the session axis over a mesh for multi-chip).
    `window`/`candidate_px` forward to fuse_session (one static window for
    all sessions — without it, large-capacity batches would silently run
    the ~3x-slower unwindowed merge). Returns (FusionState with leading S
    axis, uv2pt [S, F, HW]).
    """
    kw = dict(height=height, width=width, radius=radius,
              min_cosine=min_cosine, max_depth=max_depth, capacity=capacity,
              candidate_px=candidate_px, window=window,
              window_policy=window_policy)
    return jax.vmap(lambda *a: fuse_session(*a, **kw))(
        Ks, quats_wxyz, translations, points, normals, colors, valid
    )


def auto_window(seed_cells: int, capacity: int) -> Optional[int]:
    """Pick a merge window from the seed frame's sparsification density.

    The windowed merge path (see _fuse_frame) bounds the z-buffer scatters
    and merge segment-sums to W slots; measured on the chip the unwindowed
    path at capacity 2^20 runs ~3x slower than a right-sized window, so a
    large-capacity run with no explicit window should window automatically
    (VERDICT r2 #5). Heuristic: a frame's visible slot span covers roughly
    the slots appended while the view overlapped — a few seed-frames' worth
    of cells; 8x the seed density (rounded up to a power of two, floor 2^13)
    reproduces the hand-tuned 2^17 window of the 1M-capacity benchmark at
    its ~12-16k-cell seed frames. Returns None (unwindowed) when capacity
    is small enough that the full merge is already fast, or when the
    estimate reaches capacity (window would be a no-op).

    r3 re-measure: windowing already pays at capacity 2^17 (75.9 -> 104.6
    fps at the bench session's 3.5k-cell seed, +2.5% appended points from
    newest-preferred merges past the window), so the threshold engages
    from 2^17 up; denser seeds at small capacities still degenerate to
    unwindowed through the w >= capacity rule.
    """
    if capacity <= (1 << 16):
        return None
    w = 1 << max(int(np.ceil(np.log2(max(8 * seed_cells, 2)))), 13)
    return None if w >= capacity else int(w)


def seed_cells_for_frame(
    points0, normals0, colors0, valid0,
    height: int, width: int, radius: float, min_cosine: float,
    max_depth: float | None = None,
) -> int:
    """Occupied-cell count of a seed frame — auto_window's data input.

    Sparsifies the frame at the merge radius (exactly what _seed_frame
    will do) and counts occupied cells. ONE shared implementation for
    every caller that window-sizes a session from its data (bench.py,
    pipeline/fast.py) so the heuristic's inputs can't drift between them;
    feed the result to `auto_window(seed_cells, capacity)` — once per
    capacity of interest.

    Pass `max_depth` (the engine's own depth bound) so the sizing program
    uses the SAME bounded-table kernel shape (_frame_extent_cells /
    _sparsify_max_cells) that _seed_frame compiles — identical results by
    the overflow contract, but the compile cache is shared instead of
    paying a second multi-minute cold compile of the unbounded variant on
    the tunnel platform. Without it, the exact unbounded kernel runs.

    Cost note: this is a standalone device program + a host scalar sync
    (30-90 ms of tunnel dispatch latency, CLAUDE.md) — repeated-call paths
    should compute it once per session and pass the resulting window
    through.
    """
    bounds = {}
    if max_depth is not None:
        bounds = dict(
            extent_cells=_frame_extent_cells(max_depth, radius),
            max_cells=_sparsify_max_cells(height * width),
        )
    sp0 = sparsify.patch_sparsify(
        points0, normals0, colors0, valid0, height, width, radius,
        min_cosine, **bounds,
    )
    return int(np.asarray(jnp.sum(sp0.counts > 0)))


def visible_span_from_uv2pt(uv2pt) -> np.ndarray:
    """Per-frame matched-slot span [F] — a sizing diagnostic for `window`.

    For each frame, the spread max-min+1 of the sparse slot ids its pixels
    matched (uv2pt >= 0). The true visible span is slightly larger (it
    includes culled-but-unmatched slots), so pad the high-water mark by
    ~1.5x when choosing `window`. Frames with no matches report 0.
    """
    uv2pt = np.asarray(uv2pt)
    spans = np.zeros(len(uv2pt), np.int64)
    for f, row in enumerate(uv2pt):
        hit = row[row >= 0]
        if len(hit):
            spans[f] = int(hit.max()) - int(hit.min()) + 1
    return spans


def _dedup_pass(
    state: FusionState, radius: float, min_cosine: float, capacity: int,
    shift: Tuple[float, float, float],
) -> Tuple[FusionState, jax.Array]:
    """One voxel-merge pass over the live buffer with the voxel grid
    anchor shifted by `shift` (world units, [0, radius) per axis — passed
    as voxel_merge's origin_shift; shifting the POINTS would be a no-op
    because the grid anchors at the valid-point min). Returns (compacted
    state, slot_map [capacity] old slot -> new slot, -1 for dead slots).

    Order-preserving: new slots are numbered by each merged cell's MINIMUM
    old slot id, so the buffer stays monotone in append/view order — the
    invariant the windowed merge and the label-fuse view index rely on.
    Weighted means are exact (weights carry nmerges multiplicity).
    """
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    live = slot_ids < state.n
    m = sparsify.voxel_merge(
        state.points, state.normals, state.colors,
        state.nmerges, state.occurences, live, radius, min_cosine,
        origin_shift=jnp.asarray(shift, jnp.float32),
    )
    C = m.num_cells  # 2 * capacity padded cells
    # representative old slot per cell = min old slot id (order key)
    seg = jnp.where(m.cell_of_input >= 0, m.cell_of_input, C)
    rep = jnp.full((C,), INT32_MAX, jnp.int32).at[seg].min(
        slot_ids, mode="drop"
    )
    occupied = m.counts > 0
    # occupied cells all have rep < INT32_MAX (at least one live input),
    # empty cells rep == INT32_MAX, so a stable argsort ranks occupied
    # cells 0..n_new-1 in min-old-slot order with empties after
    order = jnp.argsort(rep)
    ranks = jnp.zeros((C,), jnp.int32).at[order].set(
        jnp.arange(C, dtype=jnp.int32)
    )
    n_new = jnp.sum(occupied).astype(jnp.int32)
    # compact by GATHER of the first `capacity` ranked cells (a [cap,9]
    # gather beats a [2*cap,*]-row scatter; both serialize per row,
    # docs/DESIGN.md) — two wide gathers, f32 data + int counters
    take = jnp.clip(order[:capacity], 0, C - 1)
    live_new = slot_ids < n_new
    wide = jnp.concatenate(
        [m.points, m.normals, m.colors], axis=1
    )[take]
    wide = jnp.where(live_new[:, None], wide, 0.0)
    iwide = jnp.stack([m.counts, m.occurences], axis=1)[take]
    iwide = jnp.where(live_new[:, None], iwide, 0)
    new_state = FusionState(
        wide[:, 0:3], wide[:, 3:6], wide[:, 6:9],
        iwide[:, 0], iwide[:, 1], n_new,
    )
    cell_clip = jnp.clip(m.cell_of_input, 0, C - 1)
    slot_map = jnp.where(
        live & (m.cell_of_input >= 0), ranks[cell_clip], -1
    ).astype(jnp.int32)
    return new_state, slot_map


@partial(jax.jit, static_argnames=("capacity", "passes"))
def dedup_state(
    state: FusionState, radius: float, min_cosine: float, *, capacity: int,
    passes: int = 5,
) -> Tuple[FusionState, jax.Array]:
    """Merge duplicate sparse points in a fused buffer (the window-overflow
    repair pass, VERDICT r4 #2).

    A frame whose visible span exceeds the merge window re-appends
    geometry it could not match (see _fuse_frame `window`); this pass
    re-applies the engine's own merge criterion — same world voxel of
    side `radius`, normal agreement above `min_cosine` — across the WHOLE
    buffer, in up to 5 shifted-grid passes. Pass 1 is the unshifted grid;
    a duplicate pair it misses straddles a voxel boundary in some axis
    set S. The all-axes radius/2-shifted pass catches S = {x,y,z} and any
    pair not separated in the remaining axes; the three single-axis
    shifted passes catch S = {x}, {y}, {z} EXACTLY (a pair within
    radius/2 of a grid-1 boundary in x shares the x cell of the
    x-shifted grid and was never separated in y/z), leaving only pairs
    that straddle 2+ axes of every tried grid — O((d/radius)^2) of the
    already-small straddler fraction. Each pass only merges, so extra
    passes strictly reduce duplicates. Running weighted means stay exact
    (weights carry nmerges). Slot order is preserved (each merged point
    takes its earliest constituent's position in the buffer), so windowed
    fusion can continue from the deduped state.

    Returns (state, slot_map [capacity] int32): slot_map[old] = new slot
    (or -1 for dead/padding slots) — remap uv2pt tables and per-slot vote
    rows through it (`remap_uv2pt`). Drivers call this when
    fuse_session's `with_stats` spans report span > window on any frame;
    it is also safe on non-overflowed states (idempotent up to shifted-
    grid re-binning).

    Reference contrast: the reference never repairs duplicates — its
    windowless O(N·F) merge cannot overflow but also cannot scale
    (fusion.py:254-260); this keeps the windowed engine's speed AND the
    full merge's duplicate-free output.
    """
    h = radius / 2
    shifts = (
        (0.0, 0.0, 0.0), (h, h, h), (h, 0.0, 0.0), (0.0, h, 0.0),
        (0.0, 0.0, h),
    )[: max(1, min(passes, 5))]
    slot_map = None
    for s in shifts:
        state, m = _dedup_pass(state, radius, min_cosine, capacity, s)
        if slot_map is None:
            slot_map = m
        else:
            slot_map = jnp.where(
                slot_map >= 0, m[jnp.clip(slot_map, 0, capacity - 1)], -1
            )
    return state, slot_map.astype(jnp.int32)


def remap_uv2pt(uv2pt: jax.Array, slot_map: jax.Array) -> jax.Array:
    """Remap a uv2pt lookup (any shape of slot ids, -1 = unmatched)
    through a dedup_state slot_map."""
    safe = jnp.clip(uv2pt, 0, slot_map.shape[0] - 1)
    return jnp.where(uv2pt >= 0, slot_map[safe], -1).astype(jnp.int32)


def save_state(state: FusionState, directory) -> None:
    """Checkpoint the fusion state (orbax) — resume interrupted sessions.

    The reference's only checkpointing is whole-stage artifacts (SURVEY.md
    §5); this adds mid-stage resume for long scans.
    """
    import orbax.checkpoint as ocp
    from pathlib import Path

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        Path(directory).absolute() / "fusion_state",
        {k: np.asarray(v) for k, v in state._asdict().items()},
        force=True,
    )
    ckptr.wait_until_finished()


def load_state(directory) -> FusionState:
    import orbax.checkpoint as ocp
    from pathlib import Path

    ckptr = ocp.StandardCheckpointer()
    d = ckptr.restore(Path(directory).absolute() / "fusion_state")
    return FusionState(**{k: jnp.asarray(v) for k, v in d.items()})


@dataclasses.dataclass
class Fusion:
    """Session-level fusion driver with the reference's public surface
    (fusion.py:80-407): fuse / filter / dump_data / load_data, plus the
    uv2pt artifact directory."""

    session: "object"  # fusion3dseg_tpu.io.rtab.SessionData
    point_range: Optional[Tuple[float, float]] = None
    decimation: int = 1
    capacity: Optional[int] = 1 << 20  # None -> auto-size from the seed frame
    # merge-window knob (ROADMAP #10): "auto" sizes it from the seed frame's
    # density (auto_window) so large-capacity runs get windowed merge speed
    # by default; None forces the full unwindowed merge; an int is manual
    window: object = "auto"
    # overflow policy when a frame's visible span exceeds the window:
    # "split" merges revisited geometry against its ORIGINAL slots at loop
    # closure instead of duplicating it (see _fuse_frame window_policy)
    window_policy: str = "split"
    # when any frame's visible span exceeded the window (the engine's
    # overflow telemetry, fuse_session with_stats), repair the appended
    # duplicates with a post-scan dedup_state pass — the default-knob
    # loop-closure fix (VERDICT r4 #2)
    auto_dedup: bool = True
    save_lookups: bool = True
    out_dir: Optional[str] = None

    ds_radius: Optional[float] = None
    ds_angle: Optional[float] = None

    @property
    def nframes(self) -> int:
        return self.session.nframes

    @property
    def npts(self) -> int:
        h, w = self.session.depth_hw
        return h * w

    def _valid_mask(self) -> np.ndarray:
        """Depth-range + decimation validity (reference fusion.py:39-47)."""
        depth = self.session.depth  # [F, H*W]
        h, w = self.session.depth_hw
        if self.point_range is not None:
            lo, hi = self.point_range
            valid = (depth > lo) & (depth <= hi)
        else:
            valid = np.ones_like(depth, bool)
        if self.decimation > 1:
            keep = np.zeros((h, w), bool)
            keep[:: self.decimation, :: self.decimation] = True
            valid = valid & keep.reshape(1, -1)
        return valid

    def fuse(
        self,
        radius: float = 0.05,
        angle: float = 10.0,
        stride: Optional[int] = None,
        max_depth: float = 10.0,
        skip: int = 1,
        verbose: bool = False,
    ):
        """Run session fusion; returns (points, normals, colors, nmerges,
        occurences) numpy arrays of the live prefix — the reference's fuse
        return contract (fusion.py:324). `stride` is accepted for the
        reference's signature (fusion.py:212) but has no effect: the voxel
        sparsifier has no patch-stride axis (radius governs)."""
        del stride
        self.ds_radius, self.ds_angle = radius, angle
        min_cosine = float(np.cos(np.deg2rad(angle)))
        h, w = self.session.depth_hw
        if self.point_range is not None and self.point_range[1] > 2 * max_depth:
            # the packed-sort frame-extent bound is 4*max_depth; a validity
            # range past 2*max_depth can put valid points outside it, and
            # the sparsifier DROPS those (ops/sparsify.voxel_merge) rather
            # than merging distant geometry
            print(
                f"warning: point_range max {self.point_range[1]} exceeds "
                f"2*max_depth = {2 * max_depth}; points beyond the frame-"
                f"extent bound are dropped by the sparsifier"
            )

        valid = self._valid_mask()
        # start at the first frame with any valid point (fusion.py:236-238)
        start = int(np.argmax(valid.any(axis=1)))
        sel = np.r_[start, np.arange(start + 1, self.nframes, skip)]

        n0 = None
        if self.capacity is None or self.window == "auto":
            # seed-frame sparsification density drives both auto knobs
            s0 = self.session
            sp = sparsify.patch_sparsify(
                jnp.asarray(s0.points[start]), jnp.asarray(s0.normals[start]),
                jnp.asarray(s0.colors[start]), jnp.asarray(valid[start]),
                h, w, float(radius), min_cosine,
                extent_cells=_frame_extent_cells(max_depth, radius),
            )
            n0 = max(int(np.asarray(jnp.sum(sp.counts > 0))), 256)
        if self.capacity is None:
            # auto-size: seed density x a generous per-frame growth
            # allowance; the saturation warning below is the backstop if a
            # pathological session still overflows
            est = n0 * (2 + len(sel) // 2)
            self.capacity = int(
                min(max(1 << (est - 1).bit_length(), 1 << 14), 1 << 21)
            )
            if verbose:
                print(f"auto capacity: seed {n0} cells -> {self.capacity}")
        window = self.window
        if window == "auto":
            window = auto_window(n0, self.capacity)
            if verbose and window is not None:
                print(f"auto window: seed {n0} cells -> {window}")

        s = self.session
        state, uv2pt, spans = fuse_session(
            jnp.asarray(s.Ks, jnp.float32),
            jnp.asarray(s.quats_wxyz[sel]),
            jnp.asarray(s.translations[sel]),
            jnp.asarray(s.points[sel]),
            jnp.asarray(s.normals[sel]),
            jnp.asarray(s.colors[sel]),
            jnp.asarray(valid[sel]),
            height=h, width=w, radius=float(radius),
            min_cosine=min_cosine, max_depth=float(max_depth),
            capacity=self.capacity, window=window,
            window_policy=self.window_policy, with_stats=True,
        )
        spans = np.asarray(spans)
        self.last_spans = spans
        self.last_overflow_frames = (
            int((spans > window).sum()) if window is not None else 0
        )
        if self.last_overflow_frames and self.auto_dedup:
            # window overflow appended duplicates (span > window on
            # last_overflow_frames frames) — repair with the engine's own
            # merge criterion and remap the uv2pt artifact to the
            # compacted slots
            state, slot_map = dedup_state(
                state, float(radius), min_cosine, capacity=self.capacity
            )
            uv2pt = remap_uv2pt(uv2pt, slot_map)
            if verbose:
                print(
                    f"window overflow on {self.last_overflow_frames} "
                    f"frames (max span {int(spans.max())} > window "
                    f"{window}); deduplicated to {int(state.n)} points"
                )
        n = int(state.n)
        if n >= self.capacity:
            import warnings

            warnings.warn(
                f"fusion buffer saturated at capacity={self.capacity}; "
                "points beyond it were dropped — rerun with a larger "
                "Fusion(capacity=...)",
                RuntimeWarning,
            )
        if verbose:
            print(f"fused {len(sel)} frames into {n} sparse points")

        if self.save_lookups and self.out_dir is not None:
            from fusion3dseg_tpu.io import artifacts

            names = [str(s.frame_numbers[i]) for i in sel]
            artifacts.save_uv2pt_batch(self.out_dir, names, uv2pt)

        self._last_uv2pt = np.asarray(uv2pt)
        self._last_frames = sel
        return (
            np.asarray(state.points[:n]),
            np.asarray(state.normals[:n]),
            np.asarray(state.colors[:n]),
            np.asarray(state.nmerges[:n]),
            np.asarray(state.occurences[:n]).astype(np.uint32),
        )

    @staticmethod
    def filter(values, threshold, data=None, less_than=False):
        """Threshold mask util (reference fusion.py:329-347)."""
        values = np.asarray(values)
        mask = values <= threshold if less_than else values >= threshold
        if data is None:
            return mask, None
        return mask, [np.asarray(d)[mask] for d in data]

    def dump_data(
        self, dirname, points,
        normals=None, colors=None, nmerges=None, occurences=None,
        compute_adjacency=True, verbose=False,
        adjacency_degree: int = 32,
    ):
        """Write fusion artifacts (+ radius adjacency at 2*ds_radius,
        reference fusion.py:349-387).

        The adjacency prefers the native host CSR builder: it yields the
        FULL (uncapped) neighbor lists — exactly the reference's adj.pkl
        contract (tree.query_radius, fusion.py:374-377) — and avoids an
        upload + device build + [N,k] download through the ~20-40 MB/s
        tunnel. Falls back to the device k-capped graph when the native
        library is unavailable."""
        from fusion3dseg_tpu.io import artifacts, native
        from fusion3dseg_tpu.ops import neighbors

        adj = None
        if compute_adjacency and self.ds_radius is not None and len(points):
            pts_np = np.asarray(points, np.float32)
            if native.available():
                adj = native.radius_graph_lists(pts_np, 2 * self.ds_radius)
            else:
                adj_fixed = np.asarray(
                    neighbors.radius_graph(
                        jnp.asarray(pts_np), 2 * self.ds_radius,
                        k=adjacency_degree,
                    )
                )
                adj = neighbors.adjacency_to_lists(adj_fixed)
        h, w = self.session.depth_hw
        artifacts.dump_fusion_data(
            dirname, points, normals, colors, nmerges, occurences,
            nframes=self.nframes, depth_hw=(h, w), adjacency=adj,
            ds_radius=self.ds_radius, ds_angle=self.ds_angle,
        )

    @classmethod
    def load_data(cls, dirname):
        from fusion3dseg_tpu.io import artifacts

        return artifacts.load_fusion_data(dirname)
