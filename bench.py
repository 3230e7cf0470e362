#!/usr/bin/env python
"""Headline benchmark: points/sec projected + label-fused at a 1M-pt cloud.

Workload (BASELINE.md): a 1M-point world cloud observed by 300 RGB-D frames;
per frame project every point, build the occlusion z-buffer uv2pt lookup,
scatter mask votes; finally threshold-classify every point. The TPU path is
one jitted lax.scan over frames; the CPU baseline is the NumPy oracle
implementing the reference's semantics (camera_utils.py projection,
nearest-depth uv2pt, voting.py fancy-index vote).

Default run covers EVERY BASELINE config (VERDICT r2 #1):
  1-3. the 1M x 300 headline kernel, validated by a FULL-session oracle
       pass (the agreement stat checks the actual timed kernel's output);
  4.   2D segmenter throughput + model-in-the-loop 3D agreement via the
       device-resident streaming path (shipped B1 weights);
  5.   the 10M x 100 single-chip gid-range-sharded kernel, also oracle-
       validated over its full session.
Secondary stats: fusion-engine fps (128k cap + auto-windowed 1M cap) and
the end-to-end pipeline (fuse -> adjacency -> vote -> split -> bbox merge).
The CPU denominator is measured over >= 12 frames, best-of-3, with the
spread recorded (single-core host fluctuates; VERDICT r2 #7).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import traceback

import numpy as np


from fusion3dseg_tpu.ops.label_fuse import (  # noqa: E402
    build_cell_index,
    plan_window_buckets,
    tpu_label_fuse,
    tpu_label_fuse_cells,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HEADLINE_METRIC = "points/sec projected+label-fused (1M-pt cloud, 300 frames)"
LAST_RECORD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "docs", "BENCH_LAST.json")

# Discovery probe: run jax device discovery in a THROWAWAY subprocess. If the
# axon tunnel is down, jax.devices() hangs forever inside PJRT init and that
# hang wedges the whole process (observed r3: the driver's record was lost to
# a single 300-s window with no retry, VERDICT r3 weak#1). A subprocess can be
# killed on timeout and retried with backoff; only after a probe succeeds does
# the main process touch jax itself.
_PROBE_CODE = "import jax, sys; sys.stdout.write(jax.devices()[0].platform)"


def probe_device(timeout=300.0):
    """One discovery attempt in a fresh subprocess; platform str or None."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return None
    except OSError:
        return None
    if r.returncode == 0 and r.stdout.strip():
        return r.stdout.strip()
    return None


def discover_device_with_retry(attempts=3, timeout=300.0,
                               backoffs=(60.0, 120.0),
                               probe=probe_device, sleep=time.sleep):
    """Device discovery with retry + backoff (VERDICT r3 next#1).

    Returns the platform string, or None once all attempts are exhausted.
    `probe`/`sleep` are injectable for the simulated-outage unit test.
    """
    for i in range(attempts):
        plat = probe(timeout)
        if plat:
            if i:
                log(f"device discovery succeeded on attempt {i + 1}")
            return plat
        if i + 1 < attempts:
            delay = backoffs[min(i, len(backoffs) - 1)]
            log(f"device discovery attempt {i + 1}/{attempts} failed "
                f"(timeout {timeout:.0f}s); retrying in {delay:.0f}s")
            sleep(delay)
    return None


def emit_discovery_failure(attempts, timeout):
    """Emit the partial-JSON error line (with a pointer to the last good
    record, if one exists) and exit 17."""
    rec = {
        "metric": HEADLINE_METRIC,
        "unit": "points/sec", "value": None, "vs_baseline": None,
        "error": f"device discovery failed after {attempts} attempts x "
                 f"{timeout:.0f}s — TPU tunnel unreachable",
    }
    try:
        with open(LAST_RECORD_PATH) as f:
            prev = json.load(f)
        rec["last_good"] = {"ts": prev.get("ts"), "value": prev.get("value"),
                            "vs_baseline": prev.get("vs_baseline")}
    except Exception:
        pass
    print(json.dumps(rec), flush=True)
    os._exit(17)


def sync(x):
    # axon platform: block_until_ready does not actually block; force a
    # host transfer of one element to wait for the computation
    return np.asarray(x[0])


def make_workload(npts, nframes, hw, seed=0):
    """Synthetic room-like workload: points on room surfaces, circular
    trajectory, per-frame masks = ground-truth class of the hit pixel."""
    from fusion3dseg_tpu.io import synthetic

    h, w = hw
    rng = np.random.default_rng(seed)
    room = synthetic.RoomSpec(num_objects=8, seed=seed)
    sx, sy, sz = room.size

    # sample world points on the 6 room surfaces (no box-surface points:
    # box classes appear in the MASKS and label occluded wall points behind
    # them; the z=sz wall carries the ~2/7 remainder, so it is ~2x denser —
    # kept as-is for comparability with every prior round's cached
    # workload/baseline numbers)
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


def cached_workload(npts, nframes, hw):
    cache = os.path.join(
        tempfile.gettempdir(),
        f"f3s_bench_{npts}_{nframes}_{hw[0]}x{hw[1]}.npz",
    )
    if os.path.exists(cache):
        log(f"loading cached workload {cache}")
        z = np.load(cache)
        return z["points"], z["K"], z["quats"], z["trans"], z["masks"]
    log(f"building workload: {npts} pts x {nframes} frames {hw} ...")
    points, K, quats, trans, masks = make_workload(npts, nframes, hw)
    np.savez(cache, points=points, K=K, quats=quats, trans=trans, masks=masks)
    return points, K, quats, trans, masks


def cpu_label_fuse(points, K, quats, trans, masks, nclasses, hw, threshold=0.5):
    """NumPy oracle: reference-semantics projection + nearest-depth uv2pt +
    fancy-index voting + thresholded classify (tests/oracle.py logic inline,
    written as efficient vectorized NumPy — a fair CPU baseline)."""
    h, w = hw
    npts = len(points)
    votes = np.zeros((npts, nclasses + 1), np.int32)
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


def run_with_retry(fn):
    """First execute after a cold compile can throw a transient backend
    error through the tunnel (observed FAILED_PRECONDITION once); one retry
    rides out flakiness without masking a real failure."""
    try:
        return fn()
    except Exception as e:
        log(f"first run failed ({type(e).__name__}: {e}); retrying once")
        time.sleep(5)
        return fn()


def headline_1m(args, result):
    """BASELINE configs 1-3: the 1M x 300 culled bucketed kernel, timed,
    plus a FULL-session CPU oracle pass validating the timed output and a
    multi-sample CPU subset timing with spread."""
    import jax.numpy as jnp

    hw = (args.height, args.width)
    points, K, quats, trans, masks = cached_workload(
        args.npts, args.frames, hw
    )

    index_build_s = 0.0
    if args.no_view_index:
        run_full = tpu_label_fuse(args.npts, args.nclasses, hw)
        # stage EVERYTHING once — re-uploading the [F, H*W] masks inside
        # run() would add a ~0.5 s tunnel transfer to every timed repeat
        dev_static = (
            jnp.asarray(points), jnp.asarray(K, jnp.float32),
            jnp.asarray(quats), jnp.asarray(trans), jnp.asarray(masks),
        )

        def run():
            return run_full(*dev_static)

        M = args.npts
    else:
        # 3D frustum-culling cell index (ops/label_fuse.build_cell_index):
        # each frame gathers only its visible KD cells (~0.14N candidates vs
        # ~0.18N for the bucketed azimuth windows, true in-frustum ~0.12N) —
        # the serialized z-buffer scatter is the cost floor, so candidate
        # volume is the headline lever (docs/DESIGN.md)
        t0 = time.perf_counter()
        cells_table, cell_lists, counts = build_cell_index(
            points, K, quats, trans, hw, cell_size=args.cell_size
        )
        index_build_s = time.perf_counter() - t0
        cs = cells_table.shape[1]
        perm, sizes, Ks = plan_window_buckets(
            counts, nbuckets=12, round_to=8, max_window=cell_lists.shape[1]
        )
        upd = sum(s * min(k, cell_lists.shape[1]) * cs
                  for s, k in zip(sizes, Ks))
        M = int(round(upd / args.frames))  # mean candidates/frame, reported
        log(f"cell index: {len(cells_table)} cells of {cs}, mean candidate "
            f"frac {M / args.npts:.3f}, built in {index_build_s:.2f}s")
        log(f"cell buckets: {list(zip(sizes, Ks))}")
        run_cells = tpu_label_fuse_cells(
            args.npts, args.nclasses, hw, Ks, sizes
        )
        # permute the frame axis on the host once (a device-side gather
        # of the [F, H*W] masks would cost ~ a frame's scatter)
        dev = (
            jnp.asarray(cells_table), jnp.asarray(cell_lists[perm]),
            jnp.asarray(K, jnp.float32), jnp.asarray(quats[perm]),
            jnp.asarray(trans[perm]), jnp.asarray(masks[perm]),
        )

        def run():
            return run_cells(*dev)

    log("compiling 1M kernel ...")
    t0 = time.perf_counter()

    def once():
        votes_d, classes_d = run()
        sync(classes_d)
        return votes_d, classes_d

    votes_d, classes_d = run_with_retry(once)
    log(f"first run (incl compile): {time.perf_counter() - t0:.2f}s")

    if args.profile:
        from fusion3dseg_tpu.utils.timing import tpu_trace

        with tpu_trace(args.profile):
            once()
        log(f"profiler trace written to {args.profile}")

    best = np.inf
    for i in range(args.repeat):
        t0 = time.perf_counter()
        votes_d, classes_d = once()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"run {i}: {dt:.3f}s")
    tpu_pps = args.npts * args.frames / best
    classes_tpu = np.asarray(classes_d)

    # CPU subset timing: >= 12 frames, best-of-3, spread recorded — the
    # single-core host fluctuates 2-3x and the headline ratio deserves a
    # characterized denominator (VERDICT r2 #7)
    of = min(args.oracle_frames, args.frames)
    log(f"cpu oracle timing on {of} frames x3 ...")
    cpu_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cpu_label_fuse(
            points, K, quats[:of], trans[:of], masks[:of], args.nclasses, hw
        )
        cpu_times.append(time.perf_counter() - t0)
    cpu_rates = [args.npts * of / t for t in cpu_times]

    # FULL-session oracle: the agreement stat must check the ACTUAL timed
    # kernel's output over all frames, not a subset on a different kernel
    # (VERDICT r2 #1a). One pass; its rate is one more CPU sample.
    log(f"cpu oracle FULL pass ({args.frames} frames) ...")
    t0 = time.perf_counter()
    _, classes_o = cpu_label_fuse(
        points, K, quats, trans, masks, args.nclasses, hw
    )
    cpu_full_dt = time.perf_counter() - t0
    cpu_rates.append(args.npts * args.frames / cpu_full_dt)
    # denominator policy: the MEDIAN of the four samples (3x subset + the
    # full pass). The single-core host fluctuates 2-3x between runs
    # (CLAUDE.md), so a single max/min sample would swing the headline
    # ratio by luck; the median with the full spread recorded is the
    # stable, characterized denominator VERDICT r2 #7 asked for.
    cpu_pps = float(np.median(cpu_rates))
    log(f"cpu full: {cpu_full_dt:.1f}s; rates "
        f"{[f'{r:.3g}' for r in cpu_rates]} -> median {cpu_pps:.3g}")

    agree = float(np.mean(classes_tpu == classes_o))
    log(f"label agreement vs oracle, FULL {args.frames}-frame session: "
        f"{agree:.6f}")

    result.update({
        "value": round(tpu_pps, 1),
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
        "frames_per_sec": round(args.frames / best, 2),
        "label_agreement": round(agree, 6),
        "label_agreement_frames": args.frames,
        "npts": args.npts,
        "frames": args.frames,
        "cpu_points_per_sec": round(cpu_pps, 1),
        "cpu_points_per_sec_spread": [round(r, 1) for r in cpu_rates],
        "cpu_full_session_seconds": round(cpu_full_dt, 1),
        "oracle_frames_measured": of,
        "view_index": not args.no_view_index,
        "view_index_window_frac": round(M / args.npts, 3),
        "view_index_build_seconds": round(index_build_s, 2),
    })


def config5_10m(args, result):
    """BASELINE config 5, single chip: 10M points x 100 frames through the
    gid-range-sharded kernel, timed and oracle-validated over the FULL
    session (VERDICT r2 #1b)."""
    import jax.numpy as jnp

    npts, frames, hw = args.tenm_npts, args.tenm_frames, (args.height, args.width)
    points, K, quats, trans, masks = cached_workload(npts, frames, hw)

    # 10M uses the same KD-cell frustum culling as the 1M headline; the
    # gid-range-sharded z-buffer (NSUB=10 sub-ranges of 2^20 ids) handles
    # the id width. Cells cut candidate volume to ~0.13N vs the azimuth
    # index's ~0.3N -> 2.07x (2.66 -> 1.28 s measured r3). The ~47 s host
    # index build is cached alongside the workload.
    tenm_cs = max(args.cell_size, 256)
    idx_cache = os.path.join(
        tempfile.gettempdir(),
        # hw belongs in the key: the visible-cell lists depend on the
        # frustum, and a stale index for another FOV would silently
        # mis-cull the timed kernel
        f"f3s_bench_cells_{npts}_{frames}_{hw[0]}x{hw[1]}_{tenm_cs}.npz",
    )
    if os.path.exists(idx_cache):
        z = np.load(idx_cache)
        cells_table, cell_lists, counts = z["t"], z["l"], z["c"]
    else:
        t0 = time.perf_counter()
        cells_table, cell_lists, counts = build_cell_index(
            points, K, quats, trans, hw, cell_size=tenm_cs
        )
        log(f"10M cell index: {len(cells_table)} cells, "
            f"{time.perf_counter() - t0:.1f}s")
        np.savez(idx_cache, t=cells_table, l=cell_lists, c=counts)

    cs = cells_table.shape[1]
    perm, sizes, Ks = plan_window_buckets(
        counts, nbuckets=12, round_to=8, max_window=cell_lists.shape[1]
    )
    run_cells = tpu_label_fuse_cells(npts, args.nclasses, hw, Ks, sizes)
    dev = (
        jnp.asarray(cells_table), jnp.asarray(cell_lists[perm]),
        jnp.asarray(K, jnp.float32), jnp.asarray(quats[perm]),
        jnp.asarray(trans[perm]), jnp.asarray(masks[perm]),
    )

    def once():
        _, classes_d = run_cells(*dev)
        sync(classes_d)
        return classes_d

    log("compiling 10M kernel ...")
    t0 = time.perf_counter()
    classes_d = run_with_retry(once)
    log(f"10M first run (incl compile): {time.perf_counter() - t0:.2f}s")
    best = np.inf
    for i in range(2):
        t0 = time.perf_counter()
        classes_d = once()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"10M run {i}: {dt:.3f}s")

    log(f"cpu oracle FULL pass ({npts} pts x {frames} frames) ...")
    t0 = time.perf_counter()
    _, classes_o = cpu_label_fuse(
        points, K, quats, trans, masks, args.nclasses, hw
    )
    cpu_dt = time.perf_counter() - t0
    agree = float(np.mean(np.asarray(classes_d) == classes_o))
    log(f"10M: {best:.3f}s TPU vs {cpu_dt:.1f}s CPU, agreement {agree:.6f}")

    result.update({
        "tenm_npts": npts,
        "tenm_frames": frames,
        "tenm_seconds": round(best, 3),
        "tenm_points_per_sec": round(npts * frames / best, 1),
        "tenm_label_agreement": round(agree, 6),
        "tenm_cpu_seconds": round(cpu_dt, 1),
        "tenm_vs_cpu": round(cpu_dt / best, 1),
    })


def fusion_and_e2e(args, result):
    """Fusion-engine fps (128k cap + auto-windowed 1M cap) and the e2e
    pipeline time (SURVEY §3.3 call stack)."""
    import jax.numpy as jnp

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
        jnp.asarray(fvalid),
    )
    # both capacity regimes use the AUTO-sized merge window (VERDICT r2 #5:
    # the windowed speed is the default, not a hand-tuned knob; r3 lowered
    # the engage threshold to 2^17 after measuring 75.9 -> 104.6 fps there)
    seed_cells = fusion_engine.seed_cells_for_frame(
        fargs[3][0], fargs[4][0], fargs[5][0], fargs[6][0],
        256, 192, 0.05, float(np.cos(np.deg2rad(10.0))), max_depth=8.0,
    )

    fcap = 1 << 17
    awin128 = fusion_engine.auto_window(seed_cells, fcap)
    fkw = dict(height=256, width=192, radius=0.05,
               min_cosine=float(np.cos(np.deg2rad(10.0))), max_depth=8.0,
               capacity=fcap, window=awin128)
    state, _ = fusion_engine.fuse_session(*fargs, **fkw)
    int(np.asarray(state.n))  # sync (compile run)
    t0 = time.perf_counter()
    state, _ = fusion_engine.fuse_session(*fargs, **fkw)
    int(np.asarray(state.n))
    fusion_fps = 48 / (time.perf_counter() - t0)
    log(f"fusion engine: {fusion_fps:.1f} frames/s (256x192, cap 128k, "
        f"auto window {awin128})")
    result["fusion_engine_frames_per_sec"] = round(fusion_fps, 1)
    result["fusion_engine_128k_auto_window"] = awin128

    # split-window policy throughput on the SAME workload (r4): the quality
    # default (Fusion driver) must not regress the engine fps — two extra
    # dynamic slices per field, same scatter volume (docs/ROUND4.md)
    fkw_split = dict(fkw, window_policy="split")
    state, _ = fusion_engine.fuse_session(*fargs, **fkw_split)
    int(np.asarray(state.n))
    t0 = time.perf_counter()
    state, _ = fusion_engine.fuse_session(*fargs, **fkw_split)
    int(np.asarray(state.n))
    split_fps = 48 / (time.perf_counter() - t0)
    log(f"fusion engine: {split_fps:.1f} frames/s (same cap/window, "
        f"window_policy=split)")
    result["fusion_engine_split_frames_per_sec"] = round(split_fps, 1)

    awin = fusion_engine.auto_window(seed_cells, 1 << 20)
    log(f"auto window: seed {seed_cells} cells -> {awin}")
    fkw_1m = dict(fkw, capacity=1 << 20, window=awin)
    state, _ = fusion_engine.fuse_session(*fargs, **fkw_1m)
    int(np.asarray(state.n))
    t0 = time.perf_counter()
    state, _ = fusion_engine.fuse_session(*fargs, **fkw_1m)
    int(np.asarray(state.n))
    fusion_1m_fps = 48 / (time.perf_counter() - t0)
    log(f"fusion engine: {fusion_1m_fps:.1f} frames/s "
        f"(cap 1M, auto window {awin})")
    result["fusion_engine_1m_cap_frames_per_sec"] = round(fusion_1m_fps, 1)
    result["fusion_engine_1m_auto_window"] = awin

    # real-capture resolution: VGA 640x480 (TUM/Kinect native). A shorter
    # session keeps the ~27 MB/s H2D staging bounded (12 frames = 136 MB);
    # fps is resolution-bound, not session-length-bound (docs/ROUND3.md #14)
    vsess = synthetic.make_session(nframes=12, depth_hw=(480, 640))
    vsd = rtab.SessionData.from_arrays(
        vsess.colors, vsess.depth, vsess.K,
        vsess.quats_wxyz[:, [1, 2, 3, 0]], vsess.translations,
    )
    vvalid = (vsd.depth > 0.1) & (vsd.depth <= 8.0)
    vargs = tuple(jnp.asarray(x) for x in (
        vsd.Ks.astype(np.float32), vsd.quats_wxyz, vsd.translations,
        vsd.points, vsd.normals, vsd.colors, vvalid))
    vkw = dict(height=480, width=640, radius=0.05,
               min_cosine=float(np.cos(np.deg2rad(10.0))), max_depth=8.0,
               capacity=1 << 18, window=1 << 14)
    state, _ = fusion_engine.fuse_session(*vargs, **vkw)
    int(np.asarray(state.n))
    t0 = time.perf_counter()
    state, _ = fusion_engine.fuse_session(*vargs, **vkw)
    int(np.asarray(state.n))
    vga_fps = 12 / (time.perf_counter() - t0)
    log(f"fusion engine: {vga_fps:.1f} frames/s (VGA 640x480, cap 256k)")
    result["fusion_engine_vga_frames_per_sec"] = round(vga_fps, 1)

    # reference-capture resolution (VERDICT r4 #4): the reference's own
    # calibration is 720x960 portrait RGB (RTAB_utils/calibration.yaml:
    # image_width 720, image_height 960) — the scale a real capture runs
    # at. 8 frames bounds the H2D staging (~155 MB at ~27 MB/s); fps is
    # resolution-bound, not session-bound.
    rsess = synthetic.make_session(nframes=8, depth_hw=(960, 720))
    rsd = rtab.SessionData.from_arrays(
        rsess.colors, rsess.depth, rsess.K,
        rsess.quats_wxyz[:, [1, 2, 3, 0]], rsess.translations,
    )
    rvalid = (rsd.depth > 0.1) & (rsd.depth <= 8.0)
    rargs = tuple(jnp.asarray(x) for x in (
        rsd.Ks.astype(np.float32), rsd.quats_wxyz, rsd.translations,
        rsd.points, rsd.normals, rsd.colors, rvalid))
    rkw = dict(height=960, width=720, radius=0.05,
               min_cosine=float(np.cos(np.deg2rad(10.0))), max_depth=8.0,
               capacity=1 << 18, window=1 << 14)
    state, _ = fusion_engine.fuse_session(*rargs, **rkw)
    int(np.asarray(state.n))
    t0 = time.perf_counter()
    state, _ = fusion_engine.fuse_session(*rargs, **rkw)
    int(np.asarray(state.n))
    ref_fps = 8 / (time.perf_counter() - t0)
    log(f"fusion engine: {ref_fps:.1f} frames/s (reference-calibration "
        f"720x960 portrait, cap 256k)")
    result["fusion_engine_ref_res_frames_per_sec"] = round(ref_fps, 1)

    # loop-closure revisit stat (r4, VERDICT r3 #4): duplicate growth when
    # the orbit revisits its start (turns=2) under window overflow. Shapes/
    # statics match the 128k block so the compiled programs are reused.
    lsess = synthetic.make_session(nframes=48, depth_hw=(256, 192), turns=2.0)
    lsd = rtab.SessionData.from_arrays(
        lsess.colors, lsess.depth, lsess.K,
        lsess.quats_wxyz[:, [1, 2, 3, 0]], lsess.translations,
    )
    lvalid = (lsd.depth > 0.1) & (lsd.depth <= 8.0)
    largs = tuple(jnp.asarray(x) for x in (
        lsd.Ks.astype(np.float32), lsd.quats_wxyz, lsd.translations,
        lsd.points, lsd.normals, lsd.colors, lvalid))
    st_full, _ = fusion_engine.fuse_session(*largs, **dict(fkw, window=None))
    n_lfull = int(np.asarray(st_full.n))
    st_n, _, spans_n = fusion_engine.fuse_session(
        *largs, with_stats=True, **fkw
    )
    st_s, _, spans_s = fusion_engine.fuse_session(
        *largs, with_stats=True, **fkw_split
    )
    n_n_raw, n_s_raw = int(np.asarray(st_n.n)), int(np.asarray(st_s.n))
    # the engine-emitted overflow telemetry (VERDICT r4 #2): frames whose
    # visible span exceeded the window — the signal the drivers key the
    # auto-dedup repair on
    ovf_n = int((np.asarray(spans_n) > awin128).sum())
    ovf_s = int((np.asarray(spans_s) > awin128).sum())
    # default knobs = the driver path: overflow triggers the post-scan
    # dedup repair (Fusion.auto_dedup / segment_session_fast auto_dedup)
    mcos = float(np.cos(np.deg2rad(10.0)))
    st_n_d, _ = fusion_engine.dedup_state(st_n, 0.05, mcos, capacity=fcap)
    st_s_d, _ = fusion_engine.dedup_state(st_s, 0.05, mcos, capacity=fcap)
    n_n, n_s = int(np.asarray(st_n_d.n)), int(np.asarray(st_s_d.n))
    dup_n = (n_n - n_lfull) / n_lfull
    dup_s = (n_s - n_lfull) / n_lfull
    # normalized comparison: dedup folds the full merge's own sub-radius
    # cross-frame pairs too, so the apples-to-apples duplicate measure is
    # vs the full merge under the SAME voxel collapse
    st_f_d, _ = fusion_engine.dedup_state(st_full, 0.05, mcos, capacity=fcap)
    n_fd = int(np.asarray(st_f_d.n))
    dup_s_norm = (n_s - n_fd) / n_fd
    # a run that fills the buffer drop-routes further appends, silently
    # CLAMPING its duplicate fraction — flag it so the policy comparison
    # is never read off a capacity artifact (review finding r4)
    sat = {"newest": n_n_raw >= fcap, "split": n_s_raw >= fcap,
           "full": n_lfull >= fcap}
    log(f"loop-closure (turns=2, window {awin128}): overflow frames "
        f"newest {ovf_n} / split {ovf_s}; duplicates after auto-dedup "
        f"newest {dup_n:+.3%} vs split {dup_s:+.3%} vs full merge "
        f"{n_lfull} pts (raw, pre-repair: newest "
        f"{(n_n_raw - n_lfull) / n_lfull:+.3%}, split "
        f"{(n_s_raw - n_lfull) / n_lfull:+.3%}; dedup-normalized split "
        f"{dup_s_norm:+.3%} vs {n_fd})"
        + (f"; SATURATED at cap {fcap}: "
           + ",".join(k for k, v in sat.items() if v) if any(sat.values())
           else ""))
    result["loopclosure_overflow_frames"] = ovf_s
    result["loopclosure_dup_frac_newest"] = round(dup_n, 4)
    result["loopclosure_dup_frac_split"] = round(dup_s, 4)
    result["loopclosure_dup_frac_newest_raw"] = round(
        (n_n_raw - n_lfull) / n_lfull, 4)
    result["loopclosure_dup_frac_split_raw"] = round(
        (n_s_raw - n_lfull) / n_lfull, 4)
    result["loopclosure_dup_frac_split_dedup_norm"] = round(dup_s_norm, 4)
    if any(sat.values()):
        result["loopclosure_saturated"] = [k for k, v in sat.items() if v]

    if args.no_e2e_stat:
        return

    # end-to-end pipeline wall time (BASELINE config-3 shape, SURVEY §3.3
    # call stack): fusion engine -> vote -> threshold classify ->
    # instance split -> OBBs + bbox merge. One warmup pass compiles every
    # stage; the reported time is a full second pass including all
    # result host<->device transfers and host steps. The session itself
    # is device-resident (uploaded once, outside the timed pass — the
    # r1-r3 convention; fargs above) via a SessionData whose array fields
    # are jax arrays, which segment_session_fast passes through without
    # re-upload.
    import dataclasses as _dc

    from fusion3dseg_tpu.pipeline.fast import segment_session_fast

    sd_dev = _dc.replace(
        sd, Ks=fargs[0], quats_wxyz=fargs[1], translations=fargs[2],
        points=fargs[3], normals=fargs[4], colors=fargs[5],
        depth=jnp.asarray(sd.depth),
    )
    fmasks_dev = jnp.asarray(fsess.gt_mask.reshape(48, -1))

    def e2e_once(outdir):
        # the PUBLIC one-call in-memory pipeline (pipeline/fast.py): ONE
        # device program for fusion + vote + classify (every dispatch on
        # this platform costs 30-90 ms of tunnel latency — the old
        # fuse -> sync n -> slice -> vote -> slice chain paid 3-4), then
        # host one-pass instance split + host OBB merge.
        res = segment_session_fast(
            sd_dev, masks=fmasks_dev, radius=fkw["radius"], angle=10.0,
            valid=fargs[6], max_depth=fkw["max_depth"], capacity=fkw["capacity"],
            window=fkw["window"],  # window_policy: the "split" default
            nclasses=args.nclasses, threshold=0.5, min_pts_per_inst=100,
            outdir=outdir,
        )
        return res.n, res.n_instances_premerge, len(res.instance_info)

    import tempfile as _tf

    with _tf.TemporaryDirectory() as td:
        e2e_once(td)  # compile warmup
        # median of 3 passes: the host split+merge tail shares this
        # single-core host with everything else and swings 0.06-0.13 s
        # run to run — same reason the CPU oracle is a median
        # (BASELINE.md protocol)
        e2e_ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            n_pts, n_inst, n_merged = e2e_once(td)
            e2e_ts.append(time.perf_counter() - t0)
        e2e_dt = float(np.median(e2e_ts))
    log(f"e2e pipeline: {e2e_dt:.2f}s for 48 frames -> {n_pts} pts, "
        f"{n_inst} instances -> {n_merged} after bbox merge "
        f"(median of {[round(t, 3) for t in e2e_ts]})")
    result.update({
        "e2e_pipeline_seconds": round(e2e_dt, 3),
        "e2e_frames_per_sec": round(48 / e2e_dt, 2),
        "e2e_seconds_samples": [round(t, 3) for t in e2e_ts],
        "e2e_points": n_pts,
        "e2e_instances": n_inst,
    })


def config4_seg2d(args, result):
    """BASELINE config 4: batched 2D inference throughput + model-in-the-
    loop 3D agreement through the device-resident streaming path, using the
    SHIPPED weights (VERDICT r2 #1c)."""
    import jax.numpy as jnp

    from fusion3dseg_tpu.models import SegFormerConfig
    from fusion3dseg_tpu.pipeline.get2dseg import (
        Segmenter2D, best_shipped_checkpoint,
    )

    model_name, ckpt = best_shipped_checkpoint()
    if model_name is None:
        model_name = "b0"
    seg = Segmenter2D(
        config=SegFormerConfig.named(model_name),
        checkpoint_dir=ckpt, batch_size=8, input_hw=(256, 256),
    )
    result["seg2d_model"] = model_name
    result["seg2d_shipped_weights"] = ckpt is not None

    # device-resident throughput at 256^2 (the 512^2 compile alone takes
    # minutes through the remote-compile tunnel; throughput scales ~4x down
    # from this number): host<->device staging would otherwise dominate and
    # measure the harness's network, not the model
    batch = jnp.asarray(
        np.random.default_rng(0).random((8, 256, 256, 3)), jnp.float32
    )
    out2d = run_with_retry(
        lambda: seg._infer(seg.params, batch, jnp.float32(0.017), 256, 256)
    )
    _ = np.asarray(out2d[0, 0, 0])  # compile + sync
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out2d = seg._infer(seg.params, batch, jnp.float32(0.017), 256, 256)
    _ = np.asarray(out2d[0, 0, 0])
    seg2d_fps = 8 * reps / (time.perf_counter() - t0)
    log(f"2D segmenter ({model_name} @256^2, device-resident): "
        f"{seg2d_fps:.1f} images/s")
    result["seg2d_images_per_sec"] = round(seg2d_fps, 1)

    # model-in-the-loop: fuse an UNSEEN synthetic session once, lift labels
    # twice — streamed model masks vs ground-truth masks — and compare the
    # per-point classes (the examples/model_in_the_loop.py protocol, run
    # inside the bench so the number lands in the driver JSON)
    from fusion3dseg_tpu.fusion import fusion as fusion_engine
    from fusion3dseg_tpu.io import rtab, synthetic
    from fusion3dseg_tpu.ops import voting
    from fusion3dseg_tpu.pipeline.streaming import stream_segment

    sess = synthetic.make_session(
        nframes=24, depth_hw=(128, 96),
        room=synthetic.RoomSpec(seed=777), appearance="textured",
    )
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
    cap = 1 << 16
    st, uv2pt = fusion_engine.fuse_session(
        jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
        jnp.asarray(sd.translations), jnp.asarray(sd.points),
        jnp.asarray(sd.normals), jnp.asarray(sd.colors), jnp.asarray(valid),
        height=128, width=96, radius=0.08,
        min_cosine=float(np.cos(np.deg2rad(20.0))), max_depth=8.0,
        capacity=cap,
    )
    n = int(np.asarray(st.n))
    t0 = time.perf_counter()
    _, classes_m = stream_segment(
        sd, seg, np.asarray(uv2pt), npts=cap, nclasses=133, threshold=0.5,
    )
    stream_dt = time.perf_counter() - t0
    gt_masks = jnp.asarray(sess.gt_mask.reshape(24, -1))
    _, classes_g = voting.vote_and_classify(
        uv2pt, gt_masks, cap, 133, threshold=0.5, filter_classes=None,
    )
    classes_g = np.asarray(classes_g)[:n]
    classes_m = np.asarray(classes_m)[:n]
    agree = float(np.mean(classes_m == classes_g))
    uncl = float(np.mean(classes_m == 133))
    log(f"model-in-the-loop (24-frame unseen textured session): "
        f"3D agreement {agree:.4f}, unclassified {uncl:.4f}, "
        f"stream {stream_dt:.1f}s")
    result["model_in_loop_3d_agreement"] = round(agree, 4)
    result["model_in_loop_unclassified"] = round(uncl, 4)
    result["model_in_loop_stream_seconds"] = round(stream_dt, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=1_000_000)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--oracle-frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--nclasses", type=int, default=133)
    ap.add_argument("--tenm-npts", type=int, default=10_000_000)
    ap.add_argument("--tenm-frames", type=int, default=100)
    ap.add_argument("--no-view-index", action="store_true",
                    help="disable the view-coherent culling index")
    ap.add_argument("--cell-size", type=int, default=128,
                    help="KD-cell size for the frustum-culling cell index")
    ap.add_argument("--no-fusion-stat", action="store_true",
                    help="skip the secondary fusion-engine measurement")
    ap.add_argument("--no-e2e-stat", action="store_true",
                    help="skip the end-to-end pipeline measurement")
    ap.add_argument("--no-10m", action="store_true",
                    help="skip the 10M x 100 config-5 measurement")
    ap.add_argument("--no-seg2d", action="store_true",
                    help="skip the 2D-inference + model-in-the-loop stats")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed run")
    ap.add_argument("--discovery-attempts", type=int, default=3)
    ap.add_argument("--discovery-timeout", type=float, default=300.0,
                    help="per-attempt probe window; normal first contact is "
                         "seconds, 300s is compile-safe")
    args = ap.parse_args()

    import threading

    # Subprocess-probe discovery with retry+backoff (VERDICT r3 next#1): a
    # transient tunnel outage must not null the round's record. Each probe
    # runs jax.devices() in a throwaway process killed on timeout.
    probed = discover_device_with_retry(
        attempts=args.discovery_attempts, timeout=args.discovery_timeout)
    if probed is None:
        emit_discovery_failure(args.discovery_attempts,
                               args.discovery_timeout)
    log(f"discovery probe: platform {probed}")

    # Backstop watchdog: even after a successful probe, the tunnel can die
    # between the probe exiting and this process's own PJRT init (rare).
    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(args.discovery_timeout):
            print(json.dumps({
                "metric": HEADLINE_METRIC,
                "unit": "points/sec", "value": None, "vs_baseline": None,
                "error": "device init hung after a successful discovery "
                         f"probe ({args.discovery_timeout:.0f}s) — tunnel "
                         "died mid-start",
            }), flush=True)
            os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    import fusion3dseg_tpu

    fusion3dseg_tpu.enable_compile_cache()
    platform = jax.devices()[0].platform
    init_done.set()
    log(f"platform: {jax.devices()}")

    result = {
        "metric": HEADLINE_METRIC,
        "unit": "points/sec",
        "platform": platform,
    }

    headline_1m(args, result)  # failure here is fatal: no headline, no JSON

    # secondary blocks fail soft — a transient tunnel error in one must not
    # cost the whole driver record
    for name, enabled, fn in (
        ("fusion/e2e", not args.no_fusion_stat, fusion_and_e2e),
        ("seg2d", not args.no_seg2d, config4_seg2d),
        ("10m", not args.no_10m, config5_10m),
    ):
        if not enabled:
            continue
        try:
            fn(args, result)
        except Exception:
            log(f"--- {name} block FAILED ---")
            traceback.print_exc(file=sys.stderr)

    print(json.dumps(result), flush=True)
    # Sidecar record: survives the stdout capture, and the discovery-failure
    # path points at it ("last_good") so an outage round still shows the most
    # recent real measurement.
    try:
        with open(LAST_RECORD_PATH, "w") as f:
            json.dump({"ts": time.time(), **result}, f, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    main()
