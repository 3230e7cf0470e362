"""Fusion + voting fused into ONE compiled program.

Motivation (docs/ROUND4.md, e2e floor): on this platform every program
dispatch costs 30-90 ms of tunnel latency, so the e2e pipeline's
fuse -> sync n -> slice -> vote -> slice chain pays 3-4 round-trips
that a fused program does not. `fuse_session_and_vote` inlines
`fuse_session` and `vote_and_classify` into a single jit: the
[F, H*W] uv2pt table never leaves the device, the caller gets back the
final state plus FULL-CAPACITY classes (uint8 — 133-class ids fit, and
the D2H through the ~20-40 MB/s tunnel is 4x smaller than int32), and
the only host sync left is the one scalar `n` read plus the final
points/classes transfers.

Reference call stack being collapsed: fusion then VotingSegmentation
(get3DSeg.py:92-94 -> segUtils/voting.py) — two separate phases there,
one device program here.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import voting
from . import fusion as fusion_engine


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "radius", "min_cosine", "max_depth",
        "capacity", "nclasses", "threshold", "filter_classes",
        "candidate_px", "window", "window_policy", "dedup", "with_stats",
    ),
)
def fuse_session_and_vote(
    Ks: jax.Array,
    quats_wxyz: jax.Array,
    translations: jax.Array,
    points: jax.Array,
    normals: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    masks: jax.Array,  # [F, H*W] class-id images (depth resolution)
    *,
    height: int,
    width: int,
    radius: float,
    min_cosine: float,
    max_depth: float,
    capacity: int,
    nclasses: int,
    threshold: float = 0.5,
    filter_classes: Optional[Tuple[int, ...]] = None,
    candidate_px: int = 1,
    window: Optional[int] = None,
    window_policy: str = "newest",
    dedup: bool = True,
    with_stats: bool = False,
) -> Tuple[fusion_engine.FusionState, jax.Array, jax.Array, jax.Array]:
    """Fuse a session AND lift the 2D masks to per-point classes, fused.

    Exactly `fuse_session(...)` followed by `vote_and_classify(uv2pt,
    masks, capacity, ...)` — numerics are bit-identical to the two-call
    sequence (pinned by tests/test_fused_pipeline.py); only the dispatch
    structure differs.

    Returns (state, uv2pt [F, H*W] int32, votes [capacity, nclasses+1]
    int32, classes [capacity]). classes is uint8 when the id range
    (nclasses, the "unclassified" id, included) fits — i.e. for the
    COCO-133 taxonomy — else int32. Rows >= state.n of votes/classes are
    vote-free padding (classified "unclassified"); slice on the host
    after reading `n`. `with_stats` (static) appends the per-frame
    visible-span telemetry (see fusion.fuse_session) — span > window on
    any frame means duplicates were appended; repair with
    `dedup_and_revote`.
    """
    out = fusion_engine.fuse_session(
        Ks, quats_wxyz, translations, points, normals, colors, valid,
        height=height, width=width, radius=radius, min_cosine=min_cosine,
        max_depth=max_depth, capacity=capacity, candidate_px=candidate_px,
        window=window, window_policy=window_policy, with_stats=with_stats,
    )
    state, uv2pt = out[0], out[1]
    votes, classes = voting.vote_and_classify(
        uv2pt, masks, capacity, nclasses,
        threshold=threshold, filter_classes=filter_classes, dedup=dedup,
    )
    if nclasses <= 255:
        classes = classes.astype(jnp.uint8)
    if with_stats:
        return state, uv2pt, votes, classes, out[2]
    return state, uv2pt, votes, classes


@partial(
    jax.jit,
    static_argnames=(
        "capacity", "nclasses", "threshold", "filter_classes", "dedup",
    ),
)
def dedup_and_revote(
    state: fusion_engine.FusionState,
    uv2pt: jax.Array,  # [F, H*W] int32 slot ids
    masks: jax.Array,  # [F, H*W] class-id images
    radius: float,
    min_cosine: float,
    *,
    capacity: int,
    nclasses: int,
    threshold: float = 0.5,
    filter_classes: Optional[Tuple[int, ...]] = None,
    dedup: bool = True,
) -> Tuple[fusion_engine.FusionState, jax.Array, jax.Array, jax.Array]:
    """Window-overflow repair for the fused fuse+vote pipeline: dedup the
    buffer (fusion.dedup_state), remap uv2pt to the compacted slots, and
    re-vote — ONE extra program dispatch, executed only when
    fuse_session_and_vote's with_stats spans reported overflow.

    Re-voting from the remapped uv2pt (instead of segment-summing the old
    vote table) keeps the per-(point, frame) dedup semantics exact: a
    frame that voted for two now-merged slots contributes one vote, the
    same as if fusion had merged them in-scan. Same return contract as
    fuse_session_and_vote.
    """
    state, slot_map = fusion_engine.dedup_state(
        state, radius, min_cosine, capacity=capacity
    )
    uv2pt = fusion_engine.remap_uv2pt(uv2pt, slot_map)
    votes, classes = voting.vote_and_classify(
        uv2pt, masks, capacity, nclasses,
        threshold=threshold, filter_classes=filter_classes, dedup=dedup,
    )
    if nclasses <= 255:
        classes = classes.astype(jnp.uint8)
    return state, uv2pt, votes, classes
