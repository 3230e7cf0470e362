"""Per-point class histogram + thresholded argmax as a Pallas TPU kernel.

The label-fusion scan emits a [F, N] uint8 winner-class matrix C (255 =
INVALID / no win); classification per point needs (total wins, max same-class
wins, argmax class) — the reference's thresholded argmax semantics
(reference voting.py:106-137). The XLA formulation (ops/label_fuse.
_histogram_classify) row-sorts C.T and extracts run lengths: ~178 ms at
[300, 1M] on one chip, dominated by the u8 sort.

This kernel computes the same statistics by dense per-class counting on the
VPU: each grid program owns a [F, TN] column tile of C resident in VMEM and
loops over the nclasses+1 class ids, counting matches with vectorized
compares (u8 compare, int32 accumulate) — no sort, no scatter, one HBM read
of C. ~134 * F compare-ops per point, measured ~4x faster than the sort.

Non-TPU backends fall back to the XLA sort path (same results, used by the
forced-CPU test harness; the kernel itself is also exercised on CPU via
pallas interpret mode in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = 255


def _hist_kernel(c_ref, total_ref, vmax_ref, cls_ref, *, nclasses, threshold):
    # Mosaic does not support i8 vector compares on this target — widen the
    # tile to i32 once (VMEM-resident; [F_pad, TN] i32 is ~0.6 MB at the
    # default shapes) and run the counting loop at i32 vector rate.
    tile = c_ref[...].astype(jnp.int32)  # [F_pad, TN]; INVALID pad rows
    total = jnp.sum((tile != INVALID).astype(jnp.int32), axis=0)  # [TN]

    def body(c, carry):
        vmax, cls = carry
        cnt = jnp.sum((tile == c).astype(jnp.int32), axis=0)
        better = cnt > vmax  # strict: ties keep the LOWEST class id (argmax)
        return jnp.where(better, cnt, vmax), jnp.where(better, c, cls)

    vmax0 = jnp.zeros(total.shape, jnp.int32)
    cls0 = jnp.zeros(total.shape, jnp.int32)
    vmax, cls = jax.lax.fori_loop(0, nclasses + 1, body, (vmax0, cls0))

    # confidence test formulated EXACTLY like _histogram_classify's
    # vmax/total >= threshold (f32 division): the multiplied form
    # vmax >= threshold*total rounds differently for thresholds that are
    # not exact binary fractions (e.g. 0.6 at vmax/total exactly on the
    # boundary), and the two paths must classify identically.
    confident = (total > 0) & (vmax > 0) & (
        vmax.astype(jnp.float32) / jnp.maximum(total, 1).astype(jnp.float32)
        >= threshold
    )
    total_ref[...] = total[None]
    vmax_ref[...] = vmax[None]
    cls_ref[...] = jnp.where(confident, cls, nclasses)[None]


@functools.partial(
    jax.jit, static_argnames=("nclasses", "threshold", "tile_n", "interpret")
)
def histogram_classify_tpu(
    C: jax.Array,
    nclasses: int,
    threshold: float = 0.5,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Classify a [F, N] uint8 winner-class matrix (N % tile_n == 0).

    Returns ((total [N], vmax [N]) int32, classes [N] int32) — the same
    contract as label_fuse._histogram_classify. Rows are padded to a sublane
    multiple with INVALID so reductions never see uninitialized lanes.
    """
    F, N = C.shape
    assert N % tile_n == 0, f"N={N} must be a multiple of tile_n={tile_n}"
    F_pad = -(-F // 8) * 8
    if F_pad != F:
        C = jnp.concatenate(
            [C, jnp.full((F_pad - F, N), INVALID, jnp.uint8)], axis=0
        )

    kern = functools.partial(
        _hist_kernel, nclasses=nclasses, threshold=float(threshold)
    )
    out = jax.ShapeDtypeStruct((1, N), jnp.int32)
    total, vmax, classes = pl.pallas_call(
        kern,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((F_pad, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out, out, out],
        interpret=interpret,
    )(C)
    return (total[0], vmax[0]), classes[0]
