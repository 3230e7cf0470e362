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
    HW = h * w
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
    HW = h * w
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
