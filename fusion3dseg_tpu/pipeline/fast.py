"""One-call in-memory pipeline: session -> fused cloud -> classes -> instances.

The file-driven stages (`process3DSeg` -> `get3dseg.segment`) remain the
artifact API (SURVEY.md §1 table); this is the latency-oriented path for
callers that hold a session in memory and want per-point classes and
instances back without writing a stage tree. It is the productized form
of the bench's e2e loop:

  * ONE device program for fusion + vote + classify
    (`fusion.fuse_session_and_vote`) when masks are precomputed — every
    extra dispatch costs 30-90 ms of tunnel latency on this platform;
  * or fusion followed by the device-resident model streaming voter
    (`pipeline.streaming.stream_segment`) when a 2D segmenter runs in
    the loop;
  * host-side one-pass instance split over the FULL radius relation
    (`ops.components.split_into_instances_by_radius`) and host OBB
    merge — at pipeline scale both are cheaper than one dispatch
    (docs/ROUND4.md item 3).

Reference call stack being collapsed: fusion.py fuse -> get3DSeg.py
segment/master_classes (three file-coupled phases there).
"""
from __future__ import annotations

import dataclasses
import functools
import tempfile
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils import taxonomy as tax

# capacity bound for shipping the FULL points/classes buffers and slicing
# on the host (zero extra dispatches, <= ~2 MB of padded payload at 2^18);
# above it the padding would dominate the transfer, so the live prefix is
# sliced on device first (one extra dispatch, O(n) payload)
_FULL_TRANSFER_MAX_CAP = 1 << 18


@dataclasses.dataclass
class FastSegmentation:
    """In-memory result of `segment_session_fast`.

    Arrays are host-side and sliced to the live prefix (n points). The
    full-capacity device state stays available as `state` for callers
    that keep fusing (e.g. to resume the session or reuse the buffer).
    `normals` / `colors` materialize lazily on first access — each is a
    full-capacity D2H transfer through the ~20-40 MB/s tunnel that the
    segmentation itself never needs.
    """

    points: np.ndarray  # [n, 3] fused cloud
    classes: np.ndarray  # [n] int32 class ids (nclasses = unclassified)
    instance_ids: np.ndarray  # [n] int instance ids (-1 = none)
    instance_info: List[dict]  # per-instance dicts (id/category_id/parent_id/area)
    n: int  # live prefix length
    n_instances_premerge: int  # instance count before the OBB merge
    state: object  # fusion.FusionState (device, full capacity)
    uv2pt: object  # [F, H*W] int32 device array (pixel -> point)
    # window-overflow telemetry (fusion.fuse_session with_stats): frames
    # whose visible span exceeded the merge window before the auto-dedup
    # repair ran (0 = no overflow, output had no window duplicates)
    overflow_frames: int = 0
    spans: Optional[np.ndarray] = None  # [F] per-frame visible slot span

    @functools.cached_property
    def normals(self) -> np.ndarray:  # [n, 3]
        # device slice: one dispatch, O(n) transfer — right for a
        # rarely-accessed field regardless of buffer capacity
        return np.asarray(self.state.normals[: self.n])

    @functools.cached_property
    def colors(self) -> np.ndarray:  # [n, 3]
        return np.asarray(self.state.colors[: self.n])


def segment_session_fast(
    session,  # io.rtab.SessionData
    masks: Optional[np.ndarray] = None,  # [F, Hd, Wd] or [F, Hd*Wd] class ids
    segmenter=None,  # pipeline.get2dseg.Segmenter2D (used when masks is None)
    *,
    radius: float = 0.05,
    angle: float = 10.0,  # max normal-vs-view angle (deg), reference default
    min_depth: float = 0.1,
    max_depth: float = 8.0,
    valid: Optional[object] = None,  # [F, H*W] bool; default from depth range
    capacity: int = 1 << 17,
    window: Optional[object] = "auto",  # "auto" | int slots | None (full merge)
    window_policy: str = "split",
    nclasses: int = 133,
    threshold: float = 0.5,
    conf_threshold: float = 0.017,  # segmenter confidence rule (model path)
    filter_classes: Optional[Sequence[int]] = None,
    split_radius: Optional[float] = None,  # default 2 * radius
    min_pts_per_inst: int = 100,
    dedup: bool = True,
    auto_dedup: bool = True,  # repair window-overflow duplicates post-scan
    merge_obbs: bool = True,
    outdir: Optional[str] = None,  # where merge_bb writes its artifacts
    taxonomy: Optional[tax.Taxonomy] = None,
) -> FastSegmentation:
    """Fuse, label-lift and instance-split a session in one call.

    Exactly one of `masks` / `segmenter` drives the labels: precomputed
    masks go through the single fused device program; a segmenter streams
    model logits into the vote on device (one compiled step per frame
    batch). Numerics match the file pipeline stage for stage — voting
    semantics are `ops.voting.vote_and_classify`, split is the full
    radius relation (reference fusion.py:374-377 KD-list semantics), and
    the optional OBB merge is `pipeline.merge_bb` on its host backend.

    Transfer note (CLAUDE.md tunnel rule): every `jnp.asarray` below is a
    no-op when the input is already a committed device array, so callers
    that run repeatedly on one session should pass a SessionData whose
    array fields (Ks/quats_wxyz/translations/points/normals/colors/depth)
    are device-resident, plus device-resident masks — otherwise each call
    re-uploads the session (~90 MB for 48 VGA-quarter frames) through the
    ~20-40 MB/s tunnel. Exception: the `segmenter` path needs
    host-resident `colors` (its per-frame cv2 resize runs on the host).
    """
    import jax.numpy as jnp

    from ..fusion import fused_pipeline, fusion as fusion_engine
    from ..ops import components

    if (masks is None) == (segmenter is None):
        raise ValueError("pass exactly one of masks= or segmenter=")
    if segmenter is not None and not dedup:
        # stream_segment's vote scan is inherently per-(point, frame)
        # deduplicated; silently returning dedup'd votes for dedup=False
        # would diverge from the masks path's semantics
        raise ValueError("dedup=False is only supported on the masks path")

    hd, wd = session.depth_hw
    if valid is None:
        valid = (session.depth > min_depth) & (session.depth <= max_depth)
    fargs = tuple(jnp.asarray(x) for x in (
        session.Ks.astype(np.float32), session.quats_wxyz,
        session.translations, session.points, session.normals,
        session.colors, valid,
    ))
    min_cosine = float(np.cos(np.deg2rad(angle)))
    kw = dict(height=hd, width=wd, radius=radius, min_cosine=min_cosine,
              max_depth=max_depth, capacity=capacity)

    if window == "auto":
        # a standalone sizing program + scalar sync (30-90 ms dispatch,
        # see seed_cells_for_frame) — repeated calls on one session
        # should compute this once and pass the int through
        window = fusion_engine.auto_window(
            fusion_engine.seed_cells_for_frame(
                fargs[3][0], fargs[4][0], fargs[5][0], fargs[6][0],
                hd, wd, radius, min_cosine, max_depth=max_depth,
            ),
            capacity,
        )

    if masks is not None:
        # jnp.asarray is a no-op for committed device arrays — callers on
        # the tunnel platform should pass device-resident masks (and a
        # device-resident SessionData, see docstring) so repeat calls
        # don't re-upload the session at ~20-40 MB/s
        fmasks = jnp.asarray(masks).reshape(session.nframes, -1)
        fclasses = (tuple(filter_classes)
                    if filter_classes is not None else None)
        state, uv2pt, _votes, classes_d, spans = (
            fused_pipeline.fuse_session_and_vote(
                *fargs, fmasks, nclasses=nclasses, threshold=threshold,
                filter_classes=fclasses, window=window,
                window_policy=window_policy, dedup=dedup,
                with_stats=True, **kw,
            )
        )
        overflow_frames, spans_h = _overflow(spans, window)
        if overflow_frames and auto_dedup:
            # span > window on some frames: the scan appended duplicates
            # it could not merge — ONE repair dispatch (dedup + uv2pt
            # remap + exact re-vote), paid only in the overflow case
            state, uv2pt, _votes, classes_d = fused_pipeline.dedup_and_revote(
                state, uv2pt, fmasks, radius, min_cosine,
                capacity=capacity, nclasses=nclasses, threshold=threshold,
                filter_classes=fclasses, dedup=dedup,
            )
        # transfer strategy, chosen statically by capacity (the
        # _append_sparsified pattern): small buffers ship full-capacity
        # and slice on the host — no extra dispatch, ~0.4 MB of padding;
        # big buffers would make that transfer O(capacity), so they pay
        # one device-slice dispatch after the n sync and ship O(n)
        if capacity <= _FULL_TRANSFER_MAX_CAP:
            state.n.copy_to_host_async()
            state.points.copy_to_host_async()
            classes_d.copy_to_host_async()
            n = int(np.asarray(state.n))
            points = np.asarray(state.points)[:n]
            classes = np.asarray(classes_d)[:n].astype(np.int32)
        else:
            n = int(np.asarray(state.n))
            pts_sl, cls_sl = state.points[:n], classes_d[:n]
            pts_sl.copy_to_host_async()
            cls_sl.copy_to_host_async()
            points = np.asarray(pts_sl)
            classes = np.asarray(cls_sl).astype(np.int32)
    else:
        state, uv2pt, spans = fusion_engine.fuse_session(
            *fargs, window=window, window_policy=window_policy,
            with_stats=True, **kw
        )
        overflow_frames, spans_h = _overflow(spans, window)
        if overflow_frames and auto_dedup:
            state, slot_map = fusion_engine.dedup_state(
                state, radius, min_cosine, capacity=capacity
            )
            uv2pt = fusion_engine.remap_uv2pt(uv2pt, slot_map)
        n = int(np.asarray(state.n))
        from .streaming import stream_segment

        _votes, classes = stream_segment(
            session, segmenter, np.asarray(uv2pt), npts=capacity,
            nclasses=nclasses, threshold=threshold,
            conf_threshold=conf_threshold,
            filter_classes=(tuple(filter_classes)
                            if filter_classes is not None else None),
        )
        classes = np.asarray(classes)[:n].astype(np.int32)
        if capacity > _FULL_TRANSFER_MAX_CAP:
            points = np.asarray(state.points[:n])
        else:
            points = np.asarray(state.points)[:n]

    _, ids, info, _ = components.split_into_instances_by_radius(
        classes, points, split_radius or 2 * radius, nclasses,
        None, min_pts_per_inst,
    )

    taxonomy = taxonomy or tax.Taxonomy()
    parent_of = dict(zip(*taxonomy.as_load_csv_tuple()[:3:2]))
    for inf in info:
        # out-of-taxonomy categories get parent None, exactly like
        # master_classes — merge_bb maps None to -1 (never merged), so a
        # raw category id can't collide with a genuine parent id
        inf["parent_id"] = parent_of.get(int(inf["category_id"]))

    n_premerge = len(info)
    if merge_obbs and info:
        from .merge_bb import _HOST_OBB_MAX_KN, merge_bb

        # merge_bb's auto backend goes to the device above this K*N;
        # hand it the device-resident sliced points so it doesn't
        # re-upload the cloud through the tunnel (merge_bb.py points_dev
        # note). The slice dispatch is only paid on that rare big path.
        pts_dev = (state.points[:n]
                   if len(info) * n > _HOST_OBB_MAX_KN else None)
        if outdir is None:
            with tempfile.TemporaryDirectory() as td:
                info, ids = merge_bb(td, info, ids, points, verbose=False,
                                     points_dev=pts_dev)
        else:
            Path(outdir).mkdir(parents=True, exist_ok=True)
            info, ids = merge_bb(outdir, info, ids, points, verbose=False,
                                 points_dev=pts_dev)

    return FastSegmentation(
        points=points, classes=classes,
        instance_ids=np.asarray(ids), instance_info=list(info),
        n=n, n_instances_premerge=n_premerge, state=state, uv2pt=uv2pt,
        overflow_frames=overflow_frames, spans=spans_h,
    )


def _overflow(spans, window) -> Tuple[int, Optional[np.ndarray]]:
    """Host-read the per-frame span telemetry; count overflowed frames.

    One small [F] int32 sync — it blocks on the fuse program the same way
    the `n` read right after would, so the no-overflow path pays no extra
    device round-trip. Unwindowed runs (window None) cannot overflow."""
    spans_h = np.asarray(spans)
    if window is None:
        return 0, spans_h
    return int((spans_h > int(window)).sum()), spans_h
