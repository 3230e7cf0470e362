"""Multi-view label voting as scatter/segment reductions.

Capability parity with reference Fusion3DSeg/segUtils/voting.py. The
reference's hot loop reads one mask per frame and does
`votes[uv2pt[valid], mask[valid]] += 1` (voting.py:92-98) — a NumPy
fancy-index add whose duplicate (point, class) pairs within one frame
collapse to a single increment. Here voting is one jitted scan over the
frame axis (or a single fused scatter across all frames in the fast path),
with both duplicate semantics available:

  * dedup_per_frame=True  — exact reference parity: per-frame presence via a
    boolean scatter, accumulated into int32 votes.
  * dedup_per_frame=False — np.add.at semantics (every pixel counts), a
    single scatter-add over the whole session; faster and arguably more
    correct, documented deviation (SURVEY.md §7.3).

Classification (`classify`) mirrors VotingSegmentation.segment
(voting.py:106-137): argmax class per point, confidence = max/total with
threshold, unvoted/unconfident points -> class `nclasses` (= 133
"unclassified"), optional filter_classes remap.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def vote_frame(
    votes: jax.Array,
    uv2pt: jax.Array,
    mask: jax.Array,
    dedup: bool = True,
) -> jax.Array:
    """Accumulate one frame's mask votes into the running votes table.

    Args:
      votes: [npts, nclasses+1] int32 running votes.
      uv2pt: [H*W] int32 pixel->point lookup (-1 = unmapped).
      mask: [H*W] int32/uint8 class-id image, already at depth resolution.
      dedup: collapse duplicate (point, class) pairs within this frame
        (reference parity, voting.py:98).

    Returns:
      updated votes [npts, nclasses+1] int32.
    """
    npts, nc1 = votes.shape
    assert npts * nc1 < 2**31, (
        f"flat vote key {npts}x{nc1} exceeds int32 — shard the point axis "
        "(parallel/voting.vote_sharded_points)"
    )
    valid = uv2pt >= 0
    cls = jnp.clip(mask.astype(jnp.int32), 0, nc1 - 1)
    # flat (point, class) key; invalid pixels get an out-of-range trash key
    # dropped by the scatter. npts * nc1 must fit int32 (~16M points at 134
    # classes) — beyond that, shard the point axis (parallel/voting.py).
    key = jnp.where(valid, uv2pt * nc1 + cls, npts * nc1)
    flat = votes.reshape(-1)
    if dedup:
        # sort keys and count only the first of each run: duplicates within
        # one frame collapse to a single increment without materializing a
        # [npts, nc1] presence buffer (whose per-frame zeroing would dwarf
        # the actual scatter traffic at 1M+ points).
        skey = jnp.sort(key)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
        )
        # drop-route duplicates instead of adding weight-0 into their LIVE
        # key (a zero add still rides that segment's serialized RMW chain;
        # docs/DESIGN.md drop-route rule) — bit-identical counts
        keep = first & (skey < npts * nc1)
        skey = jnp.where(keep, skey, npts * nc1)
        flat = flat.at[skey].add(keep.astype(votes.dtype), mode="drop")
    else:
        flat = flat.at[key].add(valid.astype(votes.dtype), mode="drop")
    return flat.reshape(npts, nc1)


@partial(jax.jit, static_argnames=("npts", "nclasses", "dedup"))
def vote_all_frames(
    uv2pt: jax.Array,
    masks: jax.Array,
    npts: int,
    nclasses: int,
    dedup: bool = True,
) -> jax.Array:
    """Vote a whole session in one compiled program.

    Args:
      uv2pt: [F, H*W] int32 per-frame pixel->point lookups.
      masks: [F, H*W] class-id images (depth resolution, flattened).
      npts: number of sparse points (static).
      nclasses: number of classes excluding "unclassified" (static).

    Returns:
      votes [npts, nclasses+1] int32.
    """
    nc1 = nclasses + 1
    votes0 = jnp.zeros((npts, nc1), jnp.int32)
    if dedup:
        # per-frame presence requires a frame-sequential scan
        def step(votes, frame):
            uv, m = frame
            return vote_frame(votes, uv, m, dedup=True), None

        votes, _ = jax.lax.scan(step, votes0, (uv2pt, masks))
        return votes
    # fast path: one giant scatter-add over all (frame, pixel) pairs
    valid = uv2pt >= 0
    # drop-route unmapped pixels (index npts is OOB -> mode="drop") rather
    # than funneling the often-majority invalid updates into row 0's RMW
    # chain as weight-0 adds (docs/DESIGN.md drop-route rule)
    pt = jnp.where(valid, uv2pt, npts).reshape(-1)
    cls = jnp.clip(masks.astype(jnp.int32), 0, nc1 - 1).reshape(-1)
    ones = valid.astype(jnp.int32).reshape(-1)
    return votes0.at[pt, cls].add(ones, mode="drop")


def classify(
    votes: jax.Array,
    threshold: float,
    nclasses: int,
    filter_classes: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Thresholded argmax classification of per-point votes.

    Matches reference VotingSegmentation.segment (voting.py:106-137):
      * total = sum over ALL classes (before filtering);
      * argmax over filter_classes columns only, if given;
      * class = nclasses when total == 0, max == 0, or max/total < threshold;
      * filtered argmax indices remapped back to original class ids.

    Args:
      votes: [npts, nclasses+1] int/float votes.
      threshold: confidence threshold on max/total.
      nclasses: "unclassified" id (= number of real classes).
      filter_classes: restrict candidates to this class subset.

    Returns:
      classes [npts] int32.
    """
    votes = votes.astype(jnp.float32)
    total = jnp.sum(votes, axis=-1)
    if filter_classes is not None:
        fc = jnp.asarray(list(filter_classes), jnp.int32)
        cand = votes[:, fc]
        arg = jnp.argmax(cand, axis=-1)
        vmax = jnp.max(cand, axis=-1)
        cls = fc[arg]
    else:
        arg = jnp.argmax(votes, axis=-1)
        vmax = jnp.max(votes, axis=-1)
        cls = arg.astype(jnp.int32)
    confident = (total > 0) & (vmax > 0) & (vmax / jnp.maximum(total, 1.0) >= threshold)
    return jnp.where(confident, cls, nclasses).astype(jnp.int32)


@partial(jax.jit, static_argnames=("npts", "nclasses", "dedup", "threshold"))
def vote_and_classify(
    uv2pt: jax.Array,
    masks: jax.Array,
    npts: int,
    nclasses: int,
    threshold: float = 0.5,
    filter_classes: Optional[Tuple[int, ...]] = None,
    dedup: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fused vote + classify for a whole session (single compiled program)."""
    votes = vote_all_frames(uv2pt, masks, npts, nclasses, dedup)
    return votes, classify(votes, threshold, nclasses, filter_classes)
