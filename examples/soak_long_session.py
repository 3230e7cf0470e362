"""Long-session soak (VERDICT r2 #10): a multi-thousand-frame synthetic
session through fuse_session_checkpointed on the real TPU, interrupted
mid-run and resumed, validating:

  * the int32 counter path (nmerges/occurences accumulate over thousands
    of frames without float rounding),
  * auto-windowed merge behavior at loop closure (the circular trajectory
    revisits its start several times),
  * checkpoint cost at scale and crash/resume bit-exactness (the resumed
    run's final state must equal an uninterrupted checkpointed run's).

Usage:  python examples/soak_long_session.py [frames] [ckpt_dir]
Prints one JSON line with fps + resume-equality booleans.
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(frames=2048, ckpt_root=None):
    import fusion3dseg_tpu

    fusion3dseg_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from fusion3dseg_tpu.fusion import fusion as fusion_engine
    from fusion3dseg_tpu.io import rtab, synthetic

    frames = int(frames)
    root = Path(ckpt_root) if ckpt_root else Path(tempfile.mkdtemp())
    h, w = 128, 96

    log(f"generating {frames}-frame session at {h}x{w} ...")
    t0 = time.perf_counter()
    # several slow laps: the trajectory closes its loop frames/turns times,
    # so late frames re-see early geometry (the windowing stress case)
    sess = synthetic.make_session(
        nframes=frames, depth_hw=(h, w), turns=4.0,
        room=synthetic.RoomSpec(seed=11, num_objects=10),
    )
    sd = rtab.SessionData.from_arrays(
        sess.colors, sess.depth, sess.K,
        sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
    )
    valid = (sd.depth > 0.1) & (sd.depth <= 8.0)
    log(f"generated in {time.perf_counter() - t0:.1f}s")

    capacity = 1 << 20
    radius = 0.05
    min_cosine = float(np.cos(np.deg2rad(10.0)))
    from fusion3dseg_tpu.ops import sparsify

    sp0 = sparsify.patch_sparsify(
        jnp.asarray(sd.points[0]), jnp.asarray(sd.normals[0]),
        jnp.asarray(sd.colors[0]), jnp.asarray(valid[0]),
        h, w, radius, min_cosine,
    )
    seed_cells = int(np.asarray(jnp.sum(sp0.counts > 0)))
    window = fusion_engine.auto_window(seed_cells, capacity)
    log(f"auto window: seed {seed_cells} cells -> {window}")

    kw = dict(height=h, width=w, radius=radius, min_cosine=min_cosine,
              max_depth=8.0, capacity=capacity, window=window,
              chunk_frames=128)
    args = (sd.Ks.astype(np.float32), sd.quats_wxyz, sd.translations,
            sd.points, sd.normals, sd.colors, valid)

    # interrupted run: 8 chunks (1024 frames), then "crash"
    d1 = root / "interrupted"
    t0 = time.perf_counter()
    st_half, _ = fusion_engine.fuse_session_checkpointed(
        *args, ckpt_dir=d1, max_chunks=8, verbose=True, **kw
    )
    t_half = time.perf_counter() - t0
    n_half = int(np.asarray(st_half.n))
    log(f"first 8 chunks: {t_half:.1f}s (incl compile), n={n_half}")

    # resume to completion (fresh call = fresh process semantics)
    t0 = time.perf_counter()
    st_resumed, uv_resumed = fusion_engine.fuse_session_checkpointed(
        *args, ckpt_dir=d1, verbose=True, **kw
    )
    t_resume = time.perf_counter() - t0
    log(f"resumed remainder: {t_resume:.1f}s")

    # uninterrupted checkpointed run for the equality check
    d2 = root / "oneshot"
    t0 = time.perf_counter()
    st_full, uv_full = fusion_engine.fuse_session_checkpointed(
        *args, ckpt_dir=d2, verbose=False, **kw
    )
    t_full = time.perf_counter() - t0
    n = int(np.asarray(st_full.n))
    fps = (frames - 1) / t_full

    eq_state = bool(
        np.array_equal(np.asarray(st_resumed.points), np.asarray(st_full.points))
        and np.array_equal(np.asarray(st_resumed.nmerges), np.asarray(st_full.nmerges))
        and np.array_equal(np.asarray(st_resumed.occurences), np.asarray(st_full.occurences))
        and int(st_resumed.n) == n
    )
    eq_uv = bool(np.array_equal(uv_resumed, uv_full))
    max_nm = int(np.asarray(st_full.nmerges).max())
    out = {
        "frames": frames,
        "points": n,
        "capacity": capacity,
        "window": window,
        "soak_fps": round(fps, 1),
        "full_run_seconds": round(t_full, 1),
        "resume_equals_oneshot_state": eq_state,
        "resume_equals_oneshot_uv2pt": eq_uv,
        "max_nmerges": max_nm,
        "saturated": n >= capacity,
    }
    print(json.dumps(out), flush=True)
    if not ckpt_root:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
