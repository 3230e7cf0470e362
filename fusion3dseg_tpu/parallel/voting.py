"""Sharded multi-view voting: frame-parallel and point-parallel shard_map.

New design (the reference is single-process; SURVEY.md §2). Two
decompositions of the vote scatter over a jax.sharding Mesh:

  * vote_sharded_frames — frames partitioned across devices, each device
    scatters its frame shard into a full local votes table, one psum over
    ICI combines them. Right when npts fits per-device (the common case).
  * vote_sharded_points — the point axis partitioned across devices (for
    clouds whose [npts, nclasses+1] votes table exceeds per-device HBM,
    e.g. the 10M-point BASELINE config 5). uv2pt/masks are replicated;
    every device keeps only its own [npts/D, nc+1] slice by masking global
    point ids into its local range. No collective needed for the votes
    themselves; the result stays sharded for the equally-sharded classify.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fusion3dseg_tpu.ops import voting as voting_ops


def vote_sharded_frames(
    mesh: Mesh,
    uv2pt: jax.Array,  # [F, HW] int32 (F divisible by mesh size)
    masks: jax.Array,  # [F, HW] uint8/int32
    npts: int,
    nclasses: int,
    axis: str = "dp",
) -> jax.Array:
    """Frame-parallel voting with psum reduction. Returns replicated votes."""

    def local_vote(uv_shard, mask_shard):
        votes = voting_ops.vote_all_frames(
            uv_shard, mask_shard, npts, nclasses, dedup=True
        )
        return jax.lax.psum(votes, axis)

    fn = shard_map(
        local_vote,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(uv2pt, masks)


def vote_sharded_points(
    mesh: Mesh,
    uv2pt: jax.Array,  # [F, HW] int32
    masks: jax.Array,  # [F, HW]
    npts: int,  # divisible by the axis size
    nclasses: int,
    threshold: float = 0.5,
    filter_classes: Optional[Tuple[int, ...]] = None,
    axis: str = "dp",
) -> Tuple[jax.Array, jax.Array]:
    """Point-parallel vote + classify; votes/classes stay point-sharded.

    Each device owns point ids [rank*npts/D, (rank+1)*npts/D): it remaps
    global uv2pt ids into its local slice and scatters only those. classify
    is elementwise over points, so it runs shard-locally too.

    Returns (votes [npts, nclasses+1] sharded on axis 0,
             classes [npts] sharded on axis 0).
    """
    naxis = mesh.shape[axis]
    assert npts % naxis == 0, f"npts {npts} not divisible by {naxis} devices"
    local_n = npts // naxis

    def local_vote(uv, m):
        rank = jax.lax.axis_index(axis)
        lo = rank * local_n
        local = uv - lo
        mine = (uv >= lo) & (uv < lo + local_n)
        local_uv = jnp.where(mine, local, -1)
        votes = voting_ops.vote_all_frames(local_uv, m, local_n, nclasses, dedup=True)
        classes = voting_ops.classify(votes, threshold, nclasses, filter_classes)
        return votes, classes

    fn = shard_map(
        local_vote,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(uv2pt, masks)
