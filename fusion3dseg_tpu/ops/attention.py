"""Fused flash-style attention Pallas kernel for spatial-reduction attention.

The SegFormer encoder's hot op (models/segformer.py EfficientAttention) is
attention with a long query axis (N = H*W/16 up to ~16k tokens) against a
spatially-reduced KV axis (M = N / sr^2, 64..1024 tokens). The XLA path
materializes the [B, heads, N, M] score tensor in HBM (f32 for the softmax)
— at B2-scale stage 1 that is 8 x 1 x 16384 x 256 x 4B = 64 MB of HBM
traffic per layer each way. This kernel computes the same attention online:
K/V for one (batch, head) stay resident in VMEM, queries stream in tiles,
and scores/softmax/weighted-sum fuse in VMEM — the score tensor never
touches HBM.

Numerics: qk in bf16 on the MXU with f32 accumulation, softmax in f32 —
matching the reference module's `softmax(f32)` behavior. No masking needed
(dense attention, shapes padded by the caller).

Falls back to the XLA einsum path on non-TPU backends (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # refs carry a leading block dim of 1: [1, TQ, D] / [1, M, D]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, M] f32 accumulation on the MXU
    p = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def sr_attention(
    q: jax.Array,  # [B, N, H, D]
    k: jax.Array,  # [B, M, H, D]
    v: jax.Array,  # [B, M, H, D]
    q_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused spatial-reduction attention. Returns [B, N, H, D].

    Scaling by 1/sqrt(D) is applied here (callers must NOT pre-scale).
    Requires N % q_tile == 0; M and D whatever fits VMEM (M*D + 2*TQ*D + TQ*M
    floats — comfortably within 16 MB for M <= 2048, D <= 128).
    `interpret=True` runs the Pallas kernel in interpret mode on any
    backend (CI kernel-logic coverage without a chip).
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    assert N % q_tile == 0, (
        f"N={N} must be a multiple of q_tile={q_tile}: the pallas grid "
        "floor-divides and would silently leave the tail rows unwritten"
    )
    scale = 1.0 / (D ** 0.5)
    q = (q * scale).astype(q.dtype)

    if jax.devices()[0].platform != "tpu" and not interpret:
        # XLA fallback (CPU paths / interpret-unfriendly environments)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v)

    # lay out as [B*H, N, D] so one grid step owns one (batch, head)
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, M, D)

    grid = (B * H, N // q_tile)
    out = pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        interpret=interpret,
    )(qh, kh, vh)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Neighborhood (sliding-window) attention — the masked/windowed variant XLA
# cannot fuse (VERDICT r1 #9 / ROADMAP #5). Each query token attends to the
# window x window spatial neighborhood around it, MASKED at image borders
# (a corner token sees only its ~(r+1)^2 in-image neighbors) — i.e. masked
# sliding-window / SASA-style local attention, NOT exact NAT parity:
# Hassani et al.'s neighborhood attention instead SHIFTS the window at
# borders so every query attends to exactly window^2 keys. The masked
# semantics are internally consistent across kernel / XLA reference / VJP
# (review finding r2). This is the natural high-resolution stage-1
# replacement for spatial-reduction attention: local detail is preserved
# instead of 8x-average-pooled away.
#
# Why XLA can't do this well: the windowed score tensor requires either a
# [N, window^2, D] gathered-key materialization (HBM traffic ~ window^2 x
# the K tensor) or N tiny dynamic slices; neither reuses the overlap between
# neighboring queries' windows. The Pallas kernel keeps the whole padded K/V
# for one (batch, head) resident in VMEM (<= 4 MB for 256^2 x 64 bf16),
# streams query row-tiles, and accumulates the window^2 shifted products
# with an online softmax — every K/V element is read from HBM exactly once.
# ---------------------------------------------------------------------------


def neighborhood_attention_reference(q, k, v, height, width, window):
    """Gather-based XLA reference (also the CPU path): q,k,v [B, N, H, D]
    with N = height*width; returns [B, N, H, D]. Border windows are clamped
    by masking (a corner token sees only its in-image neighbors)."""
    B, N, Hh, D = q.shape
    r = window // 2
    scale = 1.0 / (D ** 0.5)
    yy = jnp.arange(height)[:, None, None, None]
    xx = jnp.arange(width)[None, :, None, None]
    dy = jnp.arange(-r, r + 1)[None, None, :, None]
    dx = jnp.arange(-r, r + 1)[None, None, None, :]
    ny, nx = yy + dy, xx + dx
    valid = (ny >= 0) & (ny < height) & (nx >= 0) & (nx < width)
    idx = (jnp.clip(ny, 0, height - 1) * width + jnp.clip(nx, 0, width - 1))
    idx = idx.reshape(N, window * window)
    valid = valid.reshape(N, window * window)
    kg = k[:, idx]  # [B, N, W2, H, D]
    vg = v[:, idx]
    s = jnp.einsum("bnhd,bnwhd->bnhw", q, kg).astype(jnp.float32) * scale
    s = jnp.where(valid[None, :, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bnhw,bnwhd->bnhd", p, vg)


def _nat_kernel(q_ref, k_ref, v_ref, o_ref, *, height, width, window, th):
    """One grid step: all window^2 shifted score/value accumulations for a
    TH-row query stripe of one (batch*head), online-softmax in VMEM."""
    r = window // 2
    row0 = pl.program_id(1) * th

    q = q_ref[0].astype(jnp.float32)  # [TH, W, D] (pre-scaled)
    D = q.shape[-1]

    # global coordinates of this stripe's queries
    qy = row0 + jax.lax.broadcasted_iota(jnp.int32, (th, width), 0)
    qx = jax.lax.broadcasted_iota(jnp.int32, (th, width), 1)

    def dy_step(dy, carry):
        m, l, acc = carry
        # padded-array row start of the shifted K stripe: row0 + dy
        krows = k_ref[0, pl.ds(row0 + dy, th), :, :]  # [TH, W + 2r, D]
        vrows = v_ref[0, pl.ds(row0 + dy, th), :, :]
        ny = qy + (dy - r)
        yok = (ny >= 0) & (ny < height)
        # dx unrolled (window items live at once — bounded); dy rolled via
        # fori_loop so Mosaic reuses the stripe buffers instead of keeping
        # all window^2 intermediates on the VMEM stack
        for dx in range(window):
            ks = jax.lax.slice_in_dim(krows, dx, dx + width, axis=1)
            vs = jax.lax.slice_in_dim(vrows, dx, dx + width, axis=1)
            s = jnp.sum(q * ks.astype(jnp.float32), axis=-1)  # [TH, W]
            nx = qx + (dx - r)
            ok = yok & (nx >= 0) & (nx < width)
            s = jnp.where(ok, s, -jnp.inf)
            m_new = jnp.maximum(m, s)
            # guard exp(-inf - -inf): fully-masked entries keep m = -inf
            corr = jnp.where(m == -jnp.inf, 0.0, jnp.exp(m - m_new))
            p = jnp.where(s == -jnp.inf, 0.0, jnp.exp(s - m_new))
            l = l * corr + p
            acc = acc * corr[:, :, None] + p[:, :, None] * vs.astype(jnp.float32)
            m = m_new
        return m, l, acc

    m0 = jnp.full((th, width), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((th, width), jnp.float32)
    acc0 = jnp.zeros((th, width, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, window, dy_step, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, :, None]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def neighborhood_attention(
    q: jax.Array,  # [B, N, H, D], N = height*width
    k: jax.Array,
    v: jax.Array,
    height: int,
    width: int,
    window: int = 7,
    row_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused sliding-window attention. Returns [B, N, H, D].

    Scaling by 1/sqrt(D) is applied here (callers must NOT pre-scale).
    Requires height % row_tile == 0 (pick row_tile from the stage's token
    grid; stages are powers of two). VMEM budget per (batch, head):
    (height+window-1) x (width+window-1) x D x 2 bytes for K and V each —
    <= 4.3 MB at 256^2 x D=32 bf16.
    """
    B, N, Hh, D = q.shape
    assert N == height * width, (N, height, width)
    assert height % row_tile == 0, (
        f"height={height} must divide by row_tile={row_tile}: the pallas "
        "grid floor-divides and would silently leave tail rows unwritten"
    )
    if jax.devices()[0].platform != "tpu" and not interpret:
        # the reference applies the 1/sqrt(D) scale itself
        return neighborhood_attention_reference(q, k, v, height, width, window)

    scale = 1.0 / (D ** 0.5)
    q = (q * scale).astype(q.dtype)
    r = window // 2
    qh = (
        q.transpose(0, 2, 1, 3).reshape(B * Hh, height, width, D)
    )
    kh = k.transpose(0, 2, 1, 3).reshape(B * Hh, height, width, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * Hh, height, width, D)
    kp = jnp.pad(kh, ((0, 0), (r, r), (r, r), (0, 0)))
    vp = jnp.pad(vh, ((0, 0), (r, r), (r, r), (0, 0)))

    grid = (B * Hh, height // row_tile)
    out = pl.pallas_call(
        functools.partial(
            _nat_kernel, height=height, width=width, window=window,
            th=row_tile,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_tile, width, D), lambda bh, i: (bh, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, height + 2 * r, width + 2 * r, D),
                         lambda bh, i: (bh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, height + 2 * r, width + 2 * r, D),
                         lambda bh, i: (bh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, width, D), lambda bh, i: (bh, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * Hh, height, width, D), q.dtype),
        # the whole padded K/V lives in VMEM plus the stripe pipeline;
        # Mosaic's default 16 MB scoped budget is too tight at 256^2 tokens
        # (v5e VMEM is 128 MB) — raise the limit rather than shrink the
        # resident K/V, which is the whole point of the kernel
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qh, kp, vp)
    return out.reshape(B, Hh, height * width, D).transpose(0, 2, 1, 3)


def _nat_fwd(q, k, v, height, width, window, row_tile, interpret):
    return (
        neighborhood_attention(q, k, v, height, width, window, row_tile,
                               interpret),
        (q, k, v),
    )


def _nat_bwd(height, width, window, row_tile, interpret, res, g):
    # backward through the gather-based XLA reference: same math, and the
    # window^2-gather HBM cost is acceptable on the (training-only) backward
    # while the forward keeps the fused kernel
    q, k, v = res
    out, vjp = jax.vjp(
        lambda q_, k_, v_: neighborhood_attention_reference(
            q_, k_, v_, height, width, window
        ),
        q, k, v,
    )
    # the cotangent must match the reference's OUTPUT dtype exactly (bf16
    # under mixed precision — an f32 cast here fails jax.vjp's type check)
    dq, dk, dv = vjp(g.astype(out.dtype))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


neighborhood_attention.defvjp(_nat_fwd, _nat_bwd)
