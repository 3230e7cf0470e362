#!/usr/bin/env python
"""Headline benchmark: points/sec projected + label-fused at a 1M-pt cloud.

Workload (BASELINE.md): a 1M-point world cloud observed by 300 RGB-D frames;
per frame project every point, build the occlusion z-buffer uv2pt lookup,
scatter mask votes; finally threshold-classify every point. The TPU path is
one jitted lax.scan over frames; the CPU baseline is the NumPy oracle
implementing the reference's semantics (camera_utils.py projection,
nearest-depth uv2pt, voting.py fancy-index vote), measured on a frame subset
and scaled linearly (the workload is embarrassingly linear in frames; scaling
is reported in the JSON).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


from fusion3dseg_tpu.ops.label_fuse import (  # noqa: E402
    build_view_index,
    plan_window_buckets,
    tpu_label_fuse,
    tpu_label_fuse_culled,
    tpu_label_fuse_culled_big,
    tpu_label_fuse_culled_bucketed,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_workload(npts, nframes, hw, seed=0):
    """Synthetic room-like workload: points on room surfaces, circular
    trajectory, per-frame masks = ground-truth class of the hit pixel."""
    from fusion3dseg_tpu.io import synthetic

    h, w = hw
    rng = np.random.default_rng(seed)
    room = synthetic.RoomSpec(num_objects=8, seed=seed)
    sx, sy, sz = room.size

    # sample world points on the 6 room surfaces + boxes (uniform by area)
    n_per = npts // 7
    pts = []
    pts.append(np.c_[rng.uniform(0, sx, n_per), np.zeros(n_per), rng.uniform(0, sz, n_per)])
    pts.append(np.c_[rng.uniform(0, sx, n_per), np.full(n_per, sy), rng.uniform(0, sz, n_per)])
    pts.append(np.c_[np.zeros(n_per), rng.uniform(0, sy, n_per), rng.uniform(0, sz, n_per)])
    pts.append(np.c_[np.full(n_per, sx), rng.uniform(0, sy, n_per), rng.uniform(0, sz, n_per)])
    pts.append(np.c_[rng.uniform(0, sx, n_per), rng.uniform(0, sy, n_per), np.zeros(n_per)])
    rest = npts - 5 * n_per
    pts.append(np.c_[rng.uniform(0, sx, rest), rng.uniform(0, sy, rest), np.full(rest, sz)])
    points = np.vstack(pts).astype(np.float32)

    sess = synthetic.make_session(nframes=nframes, depth_hw=hw, room=room)
    masks = sess.gt_mask.reshape(nframes, -1)
    return points, sess.K, sess.quats_wxyz.astype(np.float32), sess.translations.astype(np.float32), masks


def cpu_label_fuse(points, K, quats, trans, masks, nclasses, hw, threshold=0.5):
    """NumPy oracle: reference-semantics projection + nearest-depth uv2pt +
    fancy-index voting + thresholded classify (tests/oracle.py logic inline,
    written as efficient vectorized NumPy — a fair CPU baseline)."""
    h, w = hw
    npts = len(points)
    votes = np.zeros((npts, nclasses + 1), np.int64)
    ids = np.arange(npts, dtype=np.int64)
    for f in range(len(quats)):
        q = quats[f]
        qc = np.array([q[0], -q[1], -q[2], -q[3]])
        rel = points - trans[f]
        wq, vq = qc[0], qc[1:]
        vxp = np.cross(vq, rel)
        cam = rel + 2.0 * (wq * vxp + np.cross(vq, vxp))
        with np.errstate(divide="ignore", invalid="ignore"):
            u = np.floor((K[0, 0] * cam[:, 0] + K[0, 2] * cam[:, 2]) / cam[:, 2]).astype(np.int64)
            v = np.floor((K[1, 1] * cam[:, 1] + K[1, 2] * cam[:, 2]) / cam[:, 2]).astype(np.int64)
        z = cam[:, 2]
        ok = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        pix = v[ok] * w + u[ok]
        # z-buffer SPEC shared with the TPU path: nearest wins at 4.9 mm
        # depth resolution (11-bit quantized z; the sign bit of the int32
        # packing must stay clear), ties -> lowest point index.
        # (The reference has no z-buffer at all — last write wins arbitrarily,
        # fusion.py:296-298 — so the depth-resolution of the occlusion rule is
        # this framework's choice; both implementations follow it exactly.)
        zq = np.clip(z[ok] * (2048.0 / 10.0), 0, 2047).astype(np.int64)
        id_bits = max(20, int(np.ceil(np.log2(max(npts, 2)))))
        packed = (zq << id_bits) | ids[ok]
        buf = np.full(h * w, np.iinfo(np.int64).max)
        np.minimum.at(buf, pix, packed)
        got = buf != np.iinfo(np.int64).max
        uv2pt = np.full(h * w, -1, np.int64)
        uv2pt[got] = buf[got] & ((1 << id_bits) - 1)
        # reference vote: duplicate-collapsing fancy-index += (voting.py:98)
        valid = uv2pt >= 0
        votes[uv2pt[valid], masks[f][valid]] += 1

    total = votes.sum(-1)
    cls = np.argmax(votes, axis=1)
    vmax = votes[np.arange(npts), cls]
    bad = (total == 0) | (vmax == 0) | (vmax / np.maximum(total, 1) < threshold)
    cls[bad] = nclasses
    return votes, cls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=1_000_000)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--oracle-frames", type=int, default=6)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--nclasses", type=int, default=133)
    ap.add_argument("--no-view-index", action="store_true",
                    help="disable the view-coherent culling index")
    ap.add_argument("--no-fusion-stat", action="store_true",
                    help="skip the secondary fusion-engine measurement")
    ap.add_argument("--no-e2e-stat", action="store_true",
                    help="skip the end-to-end pipeline measurement "
                         "(fuse + adjacency + vote + split + merge_bb)")
    ap.add_argument("--seg2d-stat", action="store_true",
                    help="also measure 2D-inference throughput (adds ~2 min "
                         "of model compile through the remote-compile tunnel)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed run")
    args = ap.parse_args()

    hw = (args.height, args.width)
    # cache the host-side ray-cast workload (~60 s to build) across runs
    import os
    import tempfile

    cache = os.path.join(
        tempfile.gettempdir(),
        f"f3s_bench_{args.npts}_{args.frames}_{args.height}x{args.width}.npz",
    )
    if os.path.exists(cache):
        log(f"loading cached workload {cache}")
        z = np.load(cache)
        points, K, quats, trans, masks = (
            z["points"], z["K"], z["quats"], z["trans"], z["masks"]
        )
    else:
        log(f"building workload: {args.npts} pts x {args.frames} frames {hw} ...")
        points, K, quats, trans, masks = make_workload(args.npts, args.frames, hw)
        np.savez(cache, points=points, K=K, quats=quats, trans=trans, masks=masks)

    import jax
    import jax.numpy as jnp

    import fusion3dseg_tpu

    fusion3dseg_tpu.enable_compile_cache()
    platform = jax.devices()[0].platform
    log(f"platform: {jax.devices()}")

    index_build_s = 0.0
    if args.no_view_index:
        run_full = tpu_label_fuse(args.npts, args.nclasses, hw)
        dev_static = (
            jnp.asarray(points), jnp.asarray(K, jnp.float32),
        )

        def run(quats_d, trans_d, masks_d, _starts=None):
            return run_full(*dev_static, quats_d, trans_d, masks_d)

        M = args.npts
    else:
        t0 = time.perf_counter()
        order_ext, starts, M = build_view_index(
            points, K, quats, trans, hw, round_to=32768
        )
        index_build_s = time.perf_counter() - t0
        log(f"view index: window M={M} ({M / args.npts:.2f} of N), "
            f"built in {index_build_s:.2f}s")
        points_ext = jnp.asarray(points[order_ext])
        ids_ext = jnp.asarray(order_ext, jnp.int32)
        starts_all = np.asarray(starts, np.int32)
        dev_static = (points_ext, ids_ext, jnp.asarray(K, jnp.float32))
        # window-size-bucketed scans: the scatter cost is linear in the
        # static window length, so frames grouped into right-sized scans
        # cut ~40% of the scatter volume vs one max-sized scan (works at
        # any npts — the >2^20 regime uses the gid-range-sharded z-buffer)
        counts = build_view_index.last_window_counts
        perm, sizes, Ms = plan_window_buckets(counts, nbuckets=8, max_window=M)
        log(f"window buckets: {list(zip(sizes, Ms))}")
        run_bucketed = tpu_label_fuse_culled_bucketed(
            args.npts, args.nclasses, hw, Ms, sizes
        )
        # subset runs (agreement stat) reuse the single-M kernels
        if args.npts < (1 << 20):
            run_culled = tpu_label_fuse_culled(args.npts, args.nclasses, hw, M)
        else:
            run_culled = tpu_label_fuse_culled_big(args.npts, args.nclasses, hw, M)
        # permute the frame axis on the host once (a device-side gather
        # of the [F, H*W] masks would cost ~ a frame's scatter)
        perm_dev = (
            jnp.asarray(starts_all[perm]), jnp.asarray(quats[perm]),
            jnp.asarray(trans[perm]), jnp.asarray(masks[perm]),
        )

        def run(quats_d, trans_d, masks_d, _starts=None):
            if _starts is None:  # full session: permuted bucketed scans
                return run_bucketed(
                    dev_static[0], dev_static[1], perm_dev[0],
                    dev_static[2], perm_dev[1], perm_dev[2], perm_dev[3],
                )
            return run_culled(dev_static[0], dev_static[1],
                              jnp.asarray(_starts),
                              dev_static[2], quats_d, trans_d, masks_d)

    dev = (jnp.asarray(quats), jnp.asarray(trans), jnp.asarray(masks))
    log("compiling ...")
    def sync(x):
        # axon platform: block_until_ready does not actually block; force a
        # host transfer of one element to wait for the computation
        return np.asarray(x[0])

    t0 = time.perf_counter()
    try:
        votes_d, classes_d = run(*dev)
        sync(classes_d)
    except Exception as e:  # transient tunnel/backend hiccups on the first
        # execute (observed a one-off FAILED_PRECONDITION right after a
        # cold compile); one retry rides out flakiness without masking a
        # real failure — a second error propagates
        log(f"first run failed ({type(e).__name__}: {e}); retrying once")
        time.sleep(5)
        votes_d, classes_d = run(*dev)
        sync(classes_d)
    log(f"first run (incl compile): {time.perf_counter() - t0:.2f}s")

    if args.profile:
        from fusion3dseg_tpu.utils.timing import tpu_trace

        with tpu_trace(args.profile):
            votes_d, classes_d = run(*dev)
            sync(classes_d)
        log(f"profiler trace written to {args.profile}")

    best = np.inf
    for i in range(args.repeat):
        t0 = time.perf_counter()
        votes_d, classes_d = run(*dev)
        sync(classes_d)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"run {i}: {dt:.3f}s")
    tpu_pps = args.npts * args.frames / best
    tpu_fps = args.frames / best

    # CPU oracle on a frame subset, scaled linearly
    of = min(args.oracle_frames, args.frames)
    log(f"cpu oracle on {of} frames ...")
    cpu_dt = np.inf  # best-of-2: favors the CPU -> conservative ratio
    for _ in range(2):
        t0 = time.perf_counter()
        votes_o, classes_o = cpu_label_fuse(
            points, K, quats[:of], trans[:of], masks[:of], args.nclasses, hw
        )
        cpu_dt = min(cpu_dt, time.perf_counter() - t0)
    cpu_pps = args.npts * of / cpu_dt
    log(f"cpu: {cpu_dt:.2f}s for {of} frames -> {cpu_pps:.3e} pts/s")

    # exact-agreement stat on the same subset workload (same kernel + index)
    votes_s, classes_s = run(
        dev[0][:of], dev[1][:of], dev[2][:of],
        _starts=None if args.no_view_index else starts_all[:of],
    )
    agree = float(np.mean(np.asarray(classes_s) == classes_o))
    log(f"label agreement vs oracle on {of}-frame workload: {agree:.6f}")

    # secondary: full fusion-engine throughput (dense RGB-D frames -> sparse
    # cloud + uv2pt, the process3DSeg hot path) on a production-shape session
    fusion_fps = None
    fusion_1m_fps = None
    e2e = {}
    if not args.no_fusion_stat:
        from fusion3dseg_tpu.fusion import fusion as fusion_engine
        from fusion3dseg_tpu.io import rtab, synthetic

        fsess = synthetic.make_session(nframes=48, depth_hw=(256, 192))
        sd = rtab.SessionData.from_arrays(
            fsess.colors, fsess.depth, fsess.K,
            fsess.quats_wxyz[:, [1, 2, 3, 0]], fsess.translations,
        )
        fvalid = (sd.depth > 0.1) & (sd.depth <= 8.0)
        fargs = (
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            None, jnp.asarray(fvalid),  # depth unused by fuse_session
        )
        fcap = 1 << 17
        fkw = dict(height=256, width=192, stride=10, radius=0.05,
                   min_cosine=float(np.cos(np.deg2rad(10.0))), max_depth=8.0,
                   capacity=fcap)
        state, _ = fusion_engine.fuse_session(*fargs, **fkw)
        int(np.asarray(state.n))  # sync (compile run)
        t0 = time.perf_counter()
        state, _ = fusion_engine.fuse_session(*fargs, **fkw)
        int(np.asarray(state.n))
        fusion_fps = 48 / (time.perf_counter() - t0)
        log(f"fusion engine: {fusion_fps:.1f} frames/s (256x192, cap 128k)")

        # large-capacity regime: 1M-slot buffer with the merge window bound
        # to 128k slots (ROADMAP #10) — the capacity-scaling stat VERDICT r1
        # asked to keep within ~1.5x of the 128k-cap number
        fkw_1m = dict(fkw, capacity=1 << 20, window=1 << 17)
        state, _ = fusion_engine.fuse_session(*fargs, **fkw_1m)
        int(np.asarray(state.n))
        t0 = time.perf_counter()
        state, _ = fusion_engine.fuse_session(*fargs, **fkw_1m)
        int(np.asarray(state.n))
        fusion_1m_fps = 48 / (time.perf_counter() - t0)
        log(f"fusion engine: {fusion_1m_fps:.1f} frames/s (cap 1M, window 128k)")

        # end-to-end pipeline wall time (BASELINE config-3 shape, SURVEY
        # §3.3 call stack): fusion engine -> radius adjacency -> vote ->
        # threshold classify -> instance split -> OBBs + bbox merge. One
        # warmup pass compiles every stage; the reported time is a full
        # second pass including all host<->device transfers and host steps.
        if not args.no_e2e_stat:
            import tempfile as _tf

            from fusion3dseg_tpu.ops import components, neighbors, voting
            from fusion3dseg_tpu.pipeline.merge_bb import merge_bb

            fmasks = jnp.asarray(fsess.gt_mask.reshape(48, -1))

            def e2e_once(outdir):
                st, uv2pt = fusion_engine.fuse_session(*fargs, **fkw)
                n = int(np.asarray(st.n))
                pts = np.asarray(st.points[:n])
                adj = np.asarray(  # host copy: split/merge/dump all live
                    neighbors.radius_graph(  # host-side (see dump_data)
                        jnp.asarray(pts), 2 * fkw["radius"], k=32
                    )
                )
                votes_e, classes_e = voting.vote_and_classify(
                    uv2pt, fmasks, fcap, args.nclasses, threshold=0.5,
                    filter_classes=None,
                )
                classes_np = np.asarray(classes_e[:n])
                _, ids_e, info_e, _ = components.split_into_instances(
                    classes_np, adj, args.nclasses, None, 100
                )
                for inf in info_e:  # minimal parent taxonomy for the merge
                    inf["parent_id"] = inf["category_id"]
                info_m, ids_m = merge_bb(outdir, info_e, ids_e, pts,
                                         verbose=False)
                return n, len(info_e), len(info_m)

            with _tf.TemporaryDirectory() as td:
                e2e_once(td)  # compile warmup
                t0 = time.perf_counter()
                n_pts, n_inst, n_merged = e2e_once(td)
                e2e_dt = time.perf_counter() - t0
            log(f"e2e pipeline: {e2e_dt:.2f}s for 48 frames -> {n_pts} pts, "
                f"{n_inst} instances -> {n_merged} after bbox merge")
            e2e = {
                "e2e_pipeline_seconds": round(e2e_dt, 3),
                "e2e_frames_per_sec": round(48 / e2e_dt, 2),
                "e2e_points": n_pts,
                "e2e_instances": n_inst,
            }

    # secondary: batched 2D segmentation inference throughput (the model in
    # the OneFormer slot; BASELINE config 4's streaming-mask producer)
    seg2d_fps = None
    if args.seg2d_stat:
        from fusion3dseg_tpu.pipeline.get2dseg import Segmenter2D

        # device-resident measurement at 256^2 (the 512^2 compile alone
        # takes minutes through the remote-compile tunnel; throughput scales
        # ~4x down from this number): host<->device staging would otherwise
        # dominate and measure the harness's network, not the model
        seg = Segmenter2D(batch_size=8, input_hw=(256, 256))
        batch = jnp.asarray(
            np.random.default_rng(0).random((8, 256, 256, 3)), jnp.float32
        )
        out2d = seg._infer(seg.params, batch, jnp.float32(0.017), 256, 256)
        _ = np.asarray(out2d[0, 0, 0])  # compile + sync
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out2d = seg._infer(seg.params, batch, jnp.float32(0.017), 256, 256)
        _ = np.asarray(out2d[0, 0, 0])
        seg2d_fps = 8 * reps / (time.perf_counter() - t0)
        log(f"2D segmenter (B0 @256^2, bf16, device-resident): {seg2d_fps:.1f} images/s")

    result = {
        "metric": "points/sec projected+label-fused (1M-pt cloud, 300 frames)",
        "value": round(tpu_pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "frames_per_sec": round(tpu_fps, 2),
        "label_agreement": round(agree, 6),
        "platform": platform,
        "npts": args.npts,
        "frames": args.frames,
        "cpu_points_per_sec": round(cpu_pps, 1),
        "oracle_frames_measured": of,
        "view_index": not args.no_view_index,
        "view_index_window_frac": round(M / args.npts, 3),
        "view_index_build_seconds": round(index_build_s, 2),
        "fusion_engine_frames_per_sec": (
            round(fusion_fps, 1) if fusion_fps is not None else None
        ),
        "fusion_engine_1m_cap_frames_per_sec": (
            round(fusion_1m_fps, 1) if fusion_1m_fps is not None else None
        ),
        "seg2d_images_per_sec": (
            round(seg2d_fps, 1) if seg2d_fps is not None else None
        ),
        **e2e,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
