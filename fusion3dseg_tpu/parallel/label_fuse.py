"""Multi-chip session-scale label fusion (shard_map over a Mesh).

Distributes ops/label_fuse.py's pipeline over devices in two axes:

  1. the FRAME axis for the scan (each device z-buffers + class-gathers its
     frame shard against the replicated point cloud — embarrassingly
     parallel, zero communication);
  2. one all_gather of the [F/D, N] u8 winner-class shards over ICI
     (u8 keeps the collective 4x smaller than votes would be);
  3. the POINT axis for classification (each device row-sorts and
     classifies its own N/D slice of the gathered class matrix).

Output classes stay point-sharded — ready for equally-sharded downstream
consumers (instance split, OBBs) or one final all_gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import numpy as np

from fusion3dseg_tpu.geometry import camera
from fusion3dseg_tpu.ops.label_fuse import _histogram_classify
from fusion3dseg_tpu.ops.zbuffer import INT32_MAX, packed_pmin


def label_fuse_sharded(
    mesh: Mesh,
    points: jax.Array,  # [N, 3] replicated
    K: jax.Array,
    quats: jax.Array,  # [F, 4], F divisible by mesh axis size
    trans: jax.Array,  # [F, 3]
    masks: jax.Array,  # [F, H*W] uint8
    hw: Tuple[int, int],
    nclasses: int = 133,
    threshold: float = 0.5,
    axis: str = "dp",
) -> jax.Array:
    """Returns classes [N] sharded over `axis` (same values as the
    single-chip ops/label_fuse path up to identical spec)."""
    h, w = hw
    npts = points.shape[0]
    ndev = mesh.shape[axis]
    assert npts % ndev == 0, f"npts {npts} % {ndev} devices != 0"
    ID_BITS = 20
    assert npts < (1 << ID_BITS)

    def local(points_l, K_l, quats_l, trans_l, masks_l):
        ids = jax.lax.broadcasted_iota(jnp.int32, (npts, 1), 0)[:, 0]

        def step(_, frame):
            q, t, mask = frame
            u, v, z = camera.project_points(points_l, K_l, q, t)
            pmin = packed_pmin(u, v, z, ids, jnp.ones_like(z, bool), h, w,
                               id_bits=ID_BITS)
            win_id = pmin & ((1 << ID_BITS) - 1)
            has = pmin != INT32_MAX
            row = jnp.full((npts,), 255, jnp.uint8)
            row = row.at[jnp.where(has, win_id, npts)].set(
                mask.astype(jnp.uint8), mode="drop"
            )
            return None, row

        _, C_local = jax.lax.scan(step, None, (quats_l, trans_l, masks_l))
        # frames all-gather over ICI -> full [F, N] on every device
        C = jax.lax.all_gather(C_local, axis, axis=0, tiled=True)
        # classify only this device's point slice
        rank = jax.lax.axis_index(axis)
        slice_n = npts // ndev
        C_pts = jax.lax.dynamic_slice(C, (0, rank * slice_n), (C.shape[0], slice_n))
        _, classes = _histogram_classify(C_pts, nclasses, threshold)
        return classes

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(points, K, quats, trans, masks)


def label_fuse_sharded_points(
    mesh: Mesh,
    points: jax.Array,  # [N, 3], N divisible by mesh axis; shard may be ≤ 2^20
    K: jax.Array,
    quats: jax.Array,  # [F, 4]
    trans: jax.Array,  # [F, 3]
    masks: jax.Array,  # [F, H*W] uint8
    hw: Tuple[int, int],
    nclasses: int = 133,
    threshold: float = 0.5,
    axis: str = "dp",
) -> jax.Array:
    """Point-sharded label fusion for clouds beyond one device (the 10M-pt
    BASELINE config-5 axis; also lifts the 2^20 packed-id limit to
    2^20 * n_devices).

    Per frame each device z-buffers ITS point shard into a local packed
    [H*W] buffer; one `pmin` collective over ICI merges them into the global
    z-buffer (exact global occlusion); each device then keeps the winning
    classes of its own points. Poses/masks replicated; classes returned
    point-sharded over `axis`.

    Cross-device depth ties resolve by (quantized z, device-local id) —
    deterministic, documented deviation from the single-chip global-min-id
    tie-break (ties require exactly equal 4.9 mm-quantized depth).
    """
    h, w = hw
    npts = points.shape[0]
    ndev = mesh.shape[axis]
    assert npts % ndev == 0
    local_n = npts // ndev
    assert local_n < (1 << 20)
    ID_BITS = 20

    def local(points_l, K_l, quats_l, trans_l, masks_l):
        big = INT32_MAX
        ids = jax.lax.broadcasted_iota(jnp.int32, (local_n, 1), 0)[:, 0]

        def step(_, frame):
            q, t, mask = frame
            u, v, z = camera.project_points(points_l, K_l, q, t)
            pmin_local = packed_pmin(u, v, z, ids, jnp.ones_like(z, bool),
                                     h, w, id_bits=ID_BITS)
            # global z-buffer: elementwise min across devices over ICI
            pmin = jax.lax.pmin(pmin_local, axis)
            # this device's points win where the global winner came from it;
            # identical packed values on two devices (same quantized z, same
            # local id) resolve to the lowest rank so exactly one claims
            owner = (pmin == pmin_local) & (pmin != big)
            rank = jax.lax.axis_index(axis)
            first_owner = jax.lax.pmin(
                jnp.where(owner, rank, ndev).astype(jnp.int32), axis
            )
            mine = owner & (rank == first_owner)
            win_id = pmin & ((1 << ID_BITS) - 1)
            row = jnp.full((local_n,), 255, jnp.uint8)
            row = row.at[jnp.where(mine, win_id, local_n)].set(
                mask.astype(jnp.uint8), mode="drop"
            )
            return None, row

        _, C_local = jax.lax.scan(step, None, (quats_l, trans_l, masks_l))
        _, classes = _histogram_classify(C_local, nclasses, threshold)
        return classes

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(points, K, quats, trans, masks)


def plan_cell_shards(cells_table, cell_lists, counts, ndev):
    """Host-side shard plan for `label_fuse_sharded_cells`.

    Cells (from ops.label_fuse.build_cell_index) are assigned to devices in
    contiguous KD-order ranges — equal-count cells give balanced points,
    KD order keeps each device's range spatially coherent. Per frame each
    device keeps only its OWNED visible cells; the per-device lists pad to
    one static Kmax with local cell 0 (duplicate candidates are z-buffer
    no-ops, the same exactness argument as build_cell_index's padding).

    Returns (dev_lists [ndev, F, Kmax] int32 device-LOCAL cell ids,
    valid [ndev, NCd*cs] bool first-occurrence mask — padding slots repeat
    their cell's first member and must not scatter their (unclassified)
    result over the real slot's).
    """
    NC, cs, _ = cells_table.shape
    assert NC % ndev == 0, f"ncells {NC} % {ndev} devices != 0"
    NCd = NC // ndev
    F = cell_lists.shape[0]
    owner = cell_lists // NCd  # [F, Kmax_global]
    Kmax = 1
    per_dev = []
    for d in range(ndev):
        rows = []
        for f in range(F):
            vis = cell_lists[f, : counts[f]]
            loc = vis[owner[f, : counts[f]] == d] - d * NCd
            rows.append(loc)
            Kmax = max(Kmax, len(loc))
        per_dev.append(rows)
    dev_lists = np.zeros((ndev, F, Kmax), np.int32)
    for d in range(ndev):
        for f in range(F):
            dev_lists[d, f, : len(per_dev[d][f])] = per_dev[d][f]
    ids = np.ascontiguousarray(
        np.asarray(cells_table)[..., 3], dtype=np.float32
    ).view(np.int32)  # [NC, cs]
    valid = np.ones((NC, cs), bool)
    valid[:, 1:] = ids[:, 1:] != ids[:, :1]
    return dev_lists, valid.reshape(ndev, NCd * cs)


def label_fuse_sharded_cells(
    mesh: Mesh,
    cells_table,  # [NC, cs, 4] np/jax (build_cell_index), NC % ndev == 0
    dev_lists,  # [ndev, F, Kmax] int32 (plan_cell_shards)
    valid_slots,  # [ndev, NCd*cs] bool (plan_cell_shards)
    K: jax.Array,
    quats: jax.Array,  # [F, 4]
    trans: jax.Array,  # [F, 3]
    masks: jax.Array,  # [F, H*W] uint8
    hw: Tuple[int, int],
    npts: int,
    nclasses: int = 133,
    threshold: float = 0.5,
    axis: str = "dp",
) -> jax.Array:
    """Cell-sharded label fusion: the multi-chip form of the single-chip
    KD-cell kernel (ops.label_fuse.tpu_label_fuse_cells).

    Each device owns a contiguous KD-cell range — its spatial shard of the
    cloud AND of the cells-table memory. Per frame it gathers only its
    owned visible cells ([Kmax, cs, 4] block gather), z-buffers them into
    a local packed [H*W] buffer keyed by the per-frame gather slot, and one
    `pmin` collective over ICI merges the global z-buffer (exact global
    occlusion, like label_fuse_sharded_points). The winning slot maps
    pixel-side to a STABLE device-local row (owned cell * cs + offset), so
    votes accumulate in a [F, NCd*cs] class matrix that classification
    consumes device-locally. Classes return replicated [npts] (one pmax
    assembles the per-device scatters; keep it sharded downstream if the
    consumer is sharded too).

    Tie-break deviation (documented, like label_fuse_sharded_points):
    equal-quantized-z candidates resolve by in-cell gather order within a
    device and by device rank across devices, not by global point id.
    """
    h, w = hw
    ndev = mesh.shape[axis]
    NC, cs, _ = cells_table.shape
    NCd = NC // ndev
    Kmax = dev_lists.shape[2]
    LB = max(1, int(Kmax * cs - 1).bit_length())
    # LB > 20 would silently shrink packed_pmin's depth quantization below
    # the pinned z-buffer spec (max_depth / 2^11); cap it instead — shrink
    # cell_size or add devices to narrow the per-frame candidate volume
    assert LB <= 20, (
        f"per-frame candidate volume {Kmax * cs} needs {LB} id bits; > 20 "
        f"would degrade z-buffer depth resolution below the spec"
    )
    local_rows = NCd * cs

    # stage once, accept already-device-resident inputs (np.asarray on a
    # jax array would force a D2H round trip through the tunnel)
    if isinstance(cells_table, jax.Array):
        cells_dev = cells_table.astype(jnp.float32).reshape(ndev, NCd, cs, 4)
    else:
        cells_dev = jnp.asarray(
            np.asarray(cells_table, np.float32).reshape(ndev, NCd, cs, 4)
        )
    dev_lists = jnp.asarray(dev_lists)
    valid_slots = jnp.asarray(valid_slots)

    def local(cells_l, lists_l, valid_l, K_l, quats_l, trans_l, masks_l):
        cells_l = cells_l[0]  # [NCd, cs, 4]
        lists_l = lists_l[0]  # [F, Kmax]
        valid_l = valid_l[0]  # [NCd*cs]
        gids_all = jax.lax.bitcast_convert_type(
            cells_l[..., 3], jnp.int32
        ).reshape(-1)  # [NCd*cs] global point ids (stable local rows)
        rank = jax.lax.axis_index(axis)

        def step(_, frame):
            cl, q, t, mask = frame
            blocks = cells_l[cl]  # [Kmax, cs, 4]
            pts = blocks[..., :3].reshape(-1, 3)
            slot = jax.lax.broadcasted_iota(
                jnp.int32, (Kmax * cs, 1), 0
            )[:, 0]
            u, v, z = camera.project_points(pts, K_l, q, t)
            pmin_local = packed_pmin(
                u, v, z, slot, jnp.ones_like(z, bool), h, w, id_bits=LB,
                drop_invalid=True,
            )
            pmin = jax.lax.pmin(pmin_local, axis)
            owner = (pmin == pmin_local) & (pmin != INT32_MAX)
            first_owner = jax.lax.pmin(
                jnp.where(owner, rank, ndev).astype(jnp.int32), axis
            )
            mine = owner & (rank == first_owner)
            win_slot = pmin & ((1 << LB) - 1)
            # stable local row: owned cell id * cs + in-cell offset
            win_row = cl[win_slot // cs] * cs + (win_slot % cs)
            row = jnp.full((local_rows,), 255, jnp.uint8)
            row = row.at[jnp.where(mine, win_row, local_rows)].set(
                mask.astype(jnp.uint8), mode="drop"
            )
            return None, row

        _, C_local = jax.lax.scan(
            step, None, (lists_l, quats_l, trans_l, masks_l)
        )
        _, classes_local = _histogram_classify(C_local, nclasses, threshold)
        # scatter to global point order; non-owned points contribute -1 and
        # one pmax assembles the replicated result
        out = jnp.full((npts,), -1, jnp.int32)
        out = out.at[jnp.where(valid_l, gids_all, npts)].set(
            classes_local.astype(jnp.int32), mode="drop"
        )
        return jax.lax.pmax(out, axis)[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    out = fn(cells_dev, dev_lists, valid_slots, K, quats, trans, masks)
    return out[0]
