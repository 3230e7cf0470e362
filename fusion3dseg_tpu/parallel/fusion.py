"""Multi-chip fusion engine: frame-chunk-sharded scans + voxel buffer merge.

The dense-RGBD -> sparse-cloud fusion scan (fusion/fusion.py, the TPU
re-design of reference fusion.py:212-324) is sequential in its sparse-buffer
state, so the multi-chip decomposition splits the SESSION: each device runs
the full single-chip scan over its contiguous chunk of F/D frames (zero
communication — the scan never leaves the chip), and the D per-device sparse
buffers combine afterwards with ONE weighted voxel merge at the fusion
radius (ops/sparsify.voxel_merge): positions/colors merge as
nmerges-weighted means (keeping running means exact up to voxel re-binning),
normals as weighted sums with the normal-cone secondary split, and
nmerges/occurences counters sum. Every per-frame uv2pt lookup is remapped
through the merge so the artifact contract ([F, H*W] int32 into the merged
cloud, -1 invalid) is preserved.

Semantics: the single-chip scan merges a frame into ALL previously fused
frames' points; chunking merges within chunks first and reconciles across
chunks by voxel locality. Parity with the sequential scan is therefore
statistical (same criterion radius/cone), exactly like the scan's own parity
with the reference's shuffle-order greedy loop (SURVEY.md §7 hard part (a)).
tests/test_model_parallel.py bounds the deviation: merged cloud covers the
sequential cloud within the voxel diagonal and point counts stay within a
re-binning factor.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fusion3dseg_tpu.fusion.fusion import FusionState, _empty_state, _fuse_frame, _seed_frame
from fusion3dseg_tpu.ops import sparsify


def fuse_session_sharded(
    mesh: Mesh,
    Ks: jax.Array,  # [3,3] replicated
    quats_wxyz: jax.Array,  # [F,4], F divisible by the mesh axis size
    translations: jax.Array,  # [F,3]
    points: jax.Array,  # [F, H*W, 3]
    normals: jax.Array,
    colors: jax.Array,
    valid: jax.Array,  # [F, H*W] bool
    *,
    height: int,
    width: int,
    radius: float,
    min_cosine: float,
    max_depth: float,
    capacity: int,  # PER-DEVICE chunk capacity
    candidate_px: int = 1,
    axis: str = "dp",
) -> Tuple[FusionState, jax.Array]:
    """Fuse a session with the frame axis sharded over `axis`.

    Every device chunk-fuses F/D frames at `capacity`; chunk buffers merge
    into one cloud of static capacity 2*D*capacity (padded; counts == 0 are
    empty slots). Returns (merged FusionState, uv2pt [F, H*W] int32 indexing
    the MERGED cloud). Caller contract: each chunk's first frame has at
    least one valid point (chunks seed independently).
    """
    ndev = mesh.shape[axis]
    F = quats_wxyz.shape[0]
    assert F % ndev == 0, f"frames {F} % {ndev} devices != 0"

    kw = dict(height=height, width=width, radius=radius,
              min_cosine=min_cosine, max_depth=max_depth, capacity=capacity)

    def chunk(K_l, q, t, fp, fn, fc, fv):
        state = _empty_state(capacity)
        state, uv0 = _seed_frame(state, fp[0], fn[0], fc[0], fv[0], **kw)

        def step(st, frame):
            qq, tt, p, n, c, v = frame
            st, uv = _fuse_frame(st, qq, tt, p, n, c, v, Ks=K_l,
                                 candidate_px=candidate_px, **kw)
            return st, uv

        state, uv_rest = jax.lax.scan(
            step, state, (q[1:], t[1:], fp[1:], fn[1:], fc[1:], fv[1:])
        )
        uv2pt = jnp.concatenate([uv0[None], uv_rest], axis=0)
        # globalize local slots so chunk buffers can concatenate
        rank = jax.lax.axis_index(axis)
        uv2pt = jnp.where(uv2pt >= 0, uv2pt + rank * capacity, -1)
        live = (
            jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
            < state.n
        )
        n_arr = jnp.full((1,), state.n, jnp.int32)
        return (state.points, state.normals, state.colors, state.nmerges,
                state.occurences, n_arr, live, uv2pt)

    out = shard_map(
        chunk,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(axis), P(axis)),
        check_vma=False,
    )(Ks, quats_wxyz, translations, points, normals, colors, valid)
    bpts, bnrm, bclr, bnm, bocc, _, blive, uv2pt = out

    # ONE cross-chunk weighted voxel merge (replicated compute; the combined
    # buffer is D*capacity rows — small next to the frame data)
    m = sparsify.voxel_merge(
        bpts, bnrm, bclr, bnm, bocc, blive, radius, min_cosine
    )
    dest, total = sparsify.compact_slots(m.counts)
    cap_out = m.num_cells
    slot_of_cell = jnp.where(m.counts > 0, dest, -1).astype(jnp.int32)

    def take(cell_vals):
        out = jnp.zeros((cap_out,) + cell_vals.shape[1:], cell_vals.dtype)
        safe = jnp.where(m.counts > 0, dest, cap_out)
        return out.at[safe].set(cell_vals, mode="drop")

    merged = FusionState(
        take(m.points), take(m.normals), take(m.colors),
        take(m.counts), take(m.occurences), total,
    )
    # remap uv2pt: pre-merge global row -> merge cell -> compacted slot
    remap = jnp.where(
        m.cell_of_input >= 0,
        slot_of_cell[jnp.clip(m.cell_of_input, 0, cap_out - 1)],
        -1,
    ).astype(jnp.int32)
    uv2pt = jnp.where(uv2pt >= 0, remap[jnp.clip(uv2pt, 0, remap.shape[0] - 1)], -1)
    return merged, uv2pt
