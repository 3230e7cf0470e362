"""Occlusion-aware pixel->point lookup (scatter-min z-buffer).

The reference has no z-buffer: during fusion, whichever point writes a pixel
last wins arbitrarily (reference fusion.py:296-298), and its
`points2pixel` (camera_utils.py:9-26) does no occlusion or bounds handling.
Here pixel->point lookup images (`uv2pt`, the L3->L4 artifact of SURVEY.md §1)
are produced by a depth-min scatter: nearest-surface point wins, ties broken
by lowest point index for determinism. The artifact contract is kept:
[H*W] int32, -1 = unmapped.

Implementation: two segment_min passes over flattened pixel ids — XLA lowers
these to efficient TPU scatters, and everything fuses with the upstream
projection matmul under one jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


def zbuffer_uv2pt(
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    point_ids: jax.Array | None = None,
) -> jax.Array:
    """Build the uv2pt lookup for one frame with nearest-depth wins.

    Args:
      u, v: [N] int32 pixel coordinates (may be out of bounds; such points
        are dropped, unlike the reference whose Python slicing silently clips,
        fusion.py:274-277).
      z: [N] camera-frame depth; points with z <= 0 (behind camera) dropped.
      valid: [N] bool extra validity mask.
      height, width: image size (static).
      point_ids: [N] int32 ids written into the lookup; defaults to arange(N).

    Returns:
      uv2pt: [height*width] int32; -1 where no point maps.
    """
    n = u.shape[0]
    npix = height * width
    if point_ids is None:
        point_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    ok = valid & (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    # invalid points land in a trash segment npix
    pix = jnp.where(ok, v * width + u, npix)

    zmin = jax.ops.segment_min(
        jnp.where(ok, z, jnp.inf), pix, num_segments=npix + 1
    )
    winner = ok & (z <= zmin[pix])
    idx = jax.ops.segment_min(
        jnp.where(winner, point_ids, INT32_MAX), pix, num_segments=npix + 1
    )
    uv2pt = jnp.where(idx[:npix] == INT32_MAX, -1, idx[:npix]).astype(jnp.int32)
    return uv2pt


def packed_pmin(
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    ids: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    id_bits: int = 20,
    z_bits: int | None = None,
    max_depth: float = 10.0,
    drop_invalid: bool = False,
) -> jax.Array:
    """THE packed z-buffer frame step, shared by every label-fusion kernel.

    Packs quantized depth with an id into one int32 (sign bit kept clear:
    z_bits <= 31 - id_bits; 11 bits / 4.9 mm over 10 m at the defaults) and
    segment_min's over pixels. Returns pmin [height*width] int32 with
    INT32_MAX for empty pixels; the winner id is pmin & ((1<<id_bits)-1),
    the winning quantized depth pmin >> id_bits.

    Spec: nearest wins at max_depth/2^z_bits resolution, ties -> lowest id.

    drop_invalid: route invalid points to an out-of-bounds index dropped by
    the scatter instead of a shared trash segment. Bit-identical output;
    measured faster when many points are invalid (updates into one hot
    trash segment serialize on its RMW chain: 7.9-9.2 ns/update at 33-95%
    invalid vs a flat 7.3 ns with drop — see docs/DESIGN.md).
    """
    z_bits = min(z_bits if z_bits is not None else 11, 31 - id_bits)
    scale = float(1 << z_bits) / max_depth
    npix = height * width
    ok = valid & (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    zq = jnp.clip(z * scale, 0, (1 << z_bits) - 1).astype(jnp.int32)
    if z_bits == 31 - id_bits:
        # the all-ones id at the top depth bin would pack to exactly
        # INT32_MAX and alias the empty-pixel sentinel (the point would
        # silently lose every pixel it wins); nudge that ONE id's top bin
        # down — a sub-bin far-plane deviation in documented quantization
        # tie-break territory
        top = (1 << id_bits) - 1
        zq = jnp.where(ids == top, jnp.minimum(zq, (1 << z_bits) - 2), zq)
    if drop_invalid:
        pix = jnp.where(ok, v * width + u, 2 * npix)
        buf = jnp.full((npix,), INT32_MAX, jnp.int32)
        return buf.at[pix].min((zq << id_bits) | ids, mode="drop")
    pix = jnp.where(ok, v * width + u, npix)
    packed = jnp.where(ok, (zq << id_bits) | ids, INT32_MAX)
    return jax.ops.segment_min(packed, pix, num_segments=npix + 1)[:npix]


def packed_pmin_gid_sharded(
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    gids: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    nsub: int,
    id_bits: int = 20,
    z_bits: int | None = None,
    max_depth: float = 10.0,
    drop_invalid: bool = False,
) -> jax.Array:
    """Packed z-buffer for > 2^id_bits point ids: gid-RANGE sharding.

    Sub-buffer s owns global ids [s << id_bits, (s+1) << id_bits); every
    point scatters into segment (gid >> id_bits) * npix + pix, so the packed
    low bits ARE the gid's low bits — intra-sub depth ties break by global
    id EXACTLY (unlike slice-position sharding), and the cross-sub combine
    reconstructs full gids arithmetically with zero gathers. One scatter of
    len(u) updates into nsub * (height*width) + 1 segments (scatter cost is
    per-update, not per-table — measured flat from 256 to 49k segments).

    Returns pmin [nsub, height*width] int32; INT32_MAX = empty. Winner of
    sub s at a pixel has gid = (pmin & ((1<<id_bits)-1)) + (s << id_bits),
    quantized depth pmin >> id_bits.
    """
    z_bits = min(z_bits if z_bits is not None else 11, 31 - id_bits)
    scale = float(1 << z_bits) / max_depth
    npix = height * width
    ok = valid & (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    pix = v * width + u
    zq = jnp.clip(z * scale, 0, (1 << z_bits) - 1).astype(jnp.int32)
    lows = gids & ((1 << id_bits) - 1)
    if z_bits == 31 - id_bits:
        # same sentinel-alias guard as packed_pmin: a sub-range's all-ones
        # low id at the top depth bin must not pack to INT32_MAX
        zq = jnp.where(
            lows == (1 << id_bits) - 1,
            jnp.minimum(zq, (1 << z_bits) - 2), zq,
        )
    packed_ok = (zq << id_bits) | lows
    if drop_invalid:
        seg = jnp.where(ok, (gids >> id_bits) * npix + pix, 2 * nsub * npix)
        buf = jnp.full((nsub * npix,), INT32_MAX, jnp.int32)
        return buf.at[seg].min(packed_ok, mode="drop").reshape(nsub, npix)
    seg = jnp.where(ok, (gids >> id_bits) * npix + pix, nsub * npix)
    packed = jnp.where(ok, packed_ok, INT32_MAX)
    pmin = jax.ops.segment_min(packed, seg, num_segments=nsub * npix + 1)
    return pmin[: nsub * npix].reshape(nsub, npix)


def lex_combine_gid_sharded(
    pmin_sub: jax.Array, id_bits: int = 20, z_bits: int = 11
) -> tuple[jax.Array, jax.Array]:
    """Combine gid-range-sharded sub-buffers into global winners.

    Lexicographic (quantized depth, global id) min across the sub axis —
    the exact spec rule (nearest wins, ties -> lowest point id).

    Returns (win_gid [npix] int32 — garbage where empty, has [npix] bool).
    """
    nsub = pmin_sub.shape[0]
    valid = pmin_sub != INT32_MAX
    zq = jnp.where(valid, pmin_sub >> id_bits, 1 << z_bits)
    sub_base = (
        jax.lax.broadcasted_iota(jnp.int32, pmin_sub.shape, 0) << id_bits
    )
    gid = jnp.where(
        valid, (pmin_sub & ((1 << id_bits) - 1)) + sub_base, INT32_MAX
    )
    zmin = jnp.min(zq, axis=0)
    tied = valid & (zq == zmin[None])
    win_gid = jnp.min(jnp.where(tied, gid, INT32_MAX), axis=0)
    return win_gid, jnp.any(valid, axis=0)


def zbuffer_uv2pt_packed(
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    max_depth: float = 10.0,
    id_bits: int = 20,
) -> jax.Array:
    """Fast-path uv2pt via ONE packed segment_min (the production kernel).

    Packs quantized depth (31 - id_bits bits over [0, max_depth]; the int32
    sign bit stays clear) with the
    point id into a single int32 so one segment_min yields both winner and
    depth — measured ~2.5x faster than the two-pass zbuffer_uv2pt on TPU
    (XLA scatters are the bottleneck; this halves+ the scatter count and
    moves winner extraction to cheap pixel-side ops).

    Spec: nearest wins at max_depth/2^(31-id_bits) depth resolution (4.9 mm
    at the defaults), ties -> lowest point id. Supports < 2^id_bits points;
    shard the point axis beyond that (parallel/voting.py).
    """
    n = u.shape[0]
    assert n < (1 << id_bits), f"{n} points exceed {id_bits} id bits"
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    pmin = packed_pmin(u, v, z, ids, valid, height, width,
                       id_bits=id_bits, max_depth=max_depth)
    return jnp.where(pmin == INT32_MAX, -1, pmin & ((1 << id_bits) - 1)).astype(
        jnp.int32
    )


def scatter_argmin_by_segment(
    values: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Index of the minimum value per segment; INT32_MAX for empty segments.

    Generic building block behind the z-buffer (exposed for reuse by fusion's
    candidate-selection step).
    """
    vmin = jax.ops.segment_min(values, segment_ids, num_segments=num_segments)
    n = values.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    # a segment whose members are ALL +inf has no winner (inf <= inf would
    # otherwise elect one) — callers mask already-taken entries with inf
    # and rely on the empty -> INT32_MAX contract
    winner = (values <= vmin[segment_ids]) & jnp.isfinite(values)
    return jax.ops.segment_min(
        jnp.where(winner, ids, INT32_MAX), segment_ids, num_segments=num_segments
    )
