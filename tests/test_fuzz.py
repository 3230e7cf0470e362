"""Fuzz: random room seeds through the full pipeline, asserting invariants."""

import json

import numpy as np
import pytest

from fusion3dseg_tpu.io import synthetic, rtab
from fusion3dseg_tpu.pipeline import process3d, get3dseg


@pytest.mark.parametrize("seed", [11, 222, 3333])
def test_pipeline_invariants_random_rooms(tmp_path, seed):
    room = synthetic.RoomSpec(
        size=(4 + seed % 5, 2.4 + (seed % 3) * 0.3, 5 + seed % 4),
        num_objects=2 + seed % 6,
        seed=seed,
    )
    sess = synthetic.make_session(nframes=8, depth_hw=(40, 32), room=room)
    out = tmp_path / "s"
    work = tmp_path / "w"
    synthetic.write_session_dir(sess, out)

    pts, norms, clrs, nmerges, occ, nframes, hw, adj = process3d.process3DSeg(
        out, work, radius=0.12, stride=6, point_range=(0.1, 10.0),
        capacity=None, min_occ=2,
    )
    n = len(pts)
    assert n > 0
    # invariants on the fused cloud
    assert np.isfinite(pts).all() and np.isfinite(norms).all()
    nl = np.linalg.norm(norms, axis=1)
    assert np.all((nl > 0.99) & (nl < 1.01))  # unit normals
    assert (nmerges >= 1).all() and (occ >= 1).all()
    assert (occ <= nframes).all()

    get3dseg.segment(work, out / "masks", filter_classes=None,
                     min_pts_per_inst=10, verbose=False)
    cls = np.load(work / "segmentation" / "classes.npy")
    ids = np.load(work / "panoptic_segmentation" / "ids.npy")
    votes = np.load(work / "segmentation" / "votes.npy")
    assert cls.shape == (n,) and ids.shape == (n,)
    assert cls.max() <= 133 and ids.min() >= 0
    # votes totals bounded by frames (dedup: <= 1 vote per frame per class...
    # actually per (point, class) pair per frame)
    assert votes.max() <= nframes
    # info areas sum to n for panoptic ids
    info = json.loads((work / "panoptic_segmentation" / "info.json").read_text())
    assert sum(e["area"] for e in info) == n
    # final_info exists and has valid bboxes where present
    final = json.loads(
        (work / "panoptic_segmentation" / "final_info.json").read_text()
    )
    for e in final:
        if e.get("bbox"):
            assert np.isfinite(np.asarray(e["bbox"])).all()


@pytest.mark.parametrize("seed", [5, 77, 901, 4242])
def test_packed_sparsify_fuzz(seed):
    """Property: for ANY bounded point set, voxel_merge with a satisfying
    static extent bound is bit-identical to the exact 3-key sort across
    random scales, radii, validity fractions and degenerate clusters."""
    import jax.numpy as jnp

    from fusion3dseg_tpu.ops.sparsify import voxel_merge

    rng = np.random.default_rng(seed)
    N = int(rng.integers(64, 3000))
    scale = float(rng.uniform(0.5, 12.0))
    radius = float(rng.uniform(0.02, 0.5))
    pts = rng.uniform(-scale, scale, size=(N, 3)).astype(np.float32)
    # degenerate clusters: duplicate a block of points exactly
    dup = rng.integers(0, N, size=N // 4)
    pts[: len(dup)] = pts[dup]
    nrm = rng.normal(size=(N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    clr = rng.random((N, 3)).astype(np.float32)
    w = rng.integers(1, 6, size=N).astype(np.int32)
    occ = rng.integers(1, 4, size=N).astype(np.int32)
    valid = rng.random(N) > rng.uniform(0.0, 0.6)
    args = tuple(jnp.asarray(x) for x in (pts, nrm, clr, w, occ, valid))

    ref = voxel_merge(*args, radius, 0.9)
    ext = int(np.ceil(2 * scale / radius)) + 3  # satisfies the bound
    got = voxel_merge(*args, radius, 0.9, extent_cells=ext)
    for fld in ref._fields[:-1]:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, fld)), np.asarray(getattr(got, fld)),
            err_msg=f"{fld} seed={seed} N={N} ext={ext}")


@pytest.mark.parametrize("seed", [11, 313, 7777])
def test_bounded_table_sparsify_fuzz(seed):
    """Property: voxel_merge with max_cells (the r4 small-scatter-table
    path) produces identical grouping, numbering and means to the
    unbounded path — both below the bound (small branch) and in forced
    overflow (lax.cond fallback to the exact big tables)."""
    import jax.numpy as jnp

    from fusion3dseg_tpu.ops.sparsify import voxel_merge

    rng = np.random.default_rng(seed)
    N = int(rng.integers(256, 4000))
    scale = float(rng.uniform(0.5, 8.0))
    radius = float(rng.uniform(0.05, 0.5))
    pts = rng.uniform(-scale, scale, size=(N, 3)).astype(np.float32)
    nrm = rng.normal(size=(N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    clr = rng.random((N, 3)).astype(np.float32)
    w = rng.integers(1, 5, N).astype(np.int32)
    occ = rng.integers(1, 9, N).astype(np.int32)
    valid = rng.random(N) > 0.3
    args = tuple(jnp.asarray(x) for x in (pts, nrm, clr, w, occ, valid))
    ext = int(np.ceil(2 * scale / radius)) + 3

    ref = voxel_merge(*args, radius, 0.9, extent_cells=ext)
    nruns_actual = int(
        np.asarray((ref.counts > 0)[0::2].sum() + (ref.counts > 0)[1::2].sum())
    )
    # generous bounds -> small branch taken; a bound strictly below the
    # measured run count -> guaranteed overflow fallback (self-verifying:
    # derived from the unbounded result, not a magic constant); max_rows
    # exercises the sorted-prefix tail both ways. Counts/ids equality
    # below relies on no row's normal agreement landing exactly on
    # min_cosine (measure-zero for random data; see voxel_merge._prefix).
    nvalid = int(valid.sum())
    mc_overflow = max(nruns_actual - 1, 1)
    for max_cells, max_rows in (
        (2 * N - 2, None), (mc_overflow, None),
        (None, nvalid + 1), (None, max(nvalid - 7, 1)),
        (2 * N - 2, nvalid + 1), (mc_overflow, max(nvalid - 7, 1)),
    ):
        got = voxel_merge(*args, radius, 0.9, extent_cells=ext,
                          max_cells=max_cells, max_rows=max_rows)
        for fld in ref._fields[:-1]:
            r, g = np.asarray(getattr(ref, fld)), np.asarray(getattr(got, fld))
            if fld in ("points", "normals", "colors"):
                occm = np.asarray(ref.counts) > 0
                np.testing.assert_allclose(
                    r[occm], g[occm], atol=1e-6,
                    err_msg=f"{fld} seed={seed} mc={max_cells} mr={max_rows}")
            else:
                np.testing.assert_array_equal(
                    r, g, err_msg=f"{fld} seed={seed} mc={max_cells} mr={max_rows}")
