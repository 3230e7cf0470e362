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


@functools.partial(jax.jit, static_argnames=("q_tile",))
def sr_attention(
    q: jax.Array,  # [B, N, H, D]
    k: jax.Array,  # [B, M, H, D]
    v: jax.Array,  # [B, M, H, D]
    q_tile: int = 512,
) -> jax.Array:
    """Fused spatial-reduction attention. Returns [B, N, H, D].

    Scaling by 1/sqrt(D) is applied here (callers must NOT pre-scale).
    Requires N % q_tile == 0; M and D whatever fits VMEM (M*D + 2*TQ*D + TQ*M
    floats — comfortably within 16 MB for M <= 2048, D <= 128).
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    assert N % q_tile == 0, (
        f"N={N} must be a multiple of q_tile={q_tile}: the pallas grid "
        "floor-divides and would silently leave the tail rows unwritten"
    )
    scale = 1.0 / (D ** 0.5)
    q = (q * scale).astype(q.dtype)

    if jax.devices()[0].platform != "tpu":
        # XLA fallback (CPU tests / interpret-unfriendly environments)
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
    )(qh, kh, vh)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)
