"""Device-resident 2D->3D streaming: model masks feed voting without host IO.

The reference's stage contract moves masks through PNG files on disk
(get2DSeg.py:125-126 -> voting.py:66). That contract is preserved elsewhere
(pipeline/get2dseg.py + get3dseg.vote_session); this module adds the
production path of BASELINE config 4 — "batched 2D segmentation inference
streaming masks into device-resident projection": RGB frames are the only
host input, and inference -> confidence thresholding -> nearest resize to
depth resolution -> vote accumulation all run on device in ONE compiled
step per batch (model forward included — an eager per-layer apply through
the remote-device tunnel costs ~100 dispatches x 30-90 ms per batch). No
mask PNGs, no host round trips between stages.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.ops import voting as voting_ops


def _vote_logits(votes, logits, uv2pt, depth_hw, nclasses, conf_threshold):
    """Threshold + resize + scan-vote a batch of logits (jit-free core)."""
    hd, wd = depth_hw
    b = logits.shape[0]
    # argmax class + softmax-confidence -> unclassified rule
    # (reference get2DSeg.py:111-118)
    sem = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
    sem = jnp.where(conf < conf_threshold, nclasses, sem)
    # nearest resize to depth resolution (reference voting.py:93)
    sem = jax.image.resize(sem, (b, hd, wd), method="nearest")
    masks = sem.reshape(b, hd * wd).astype(jnp.uint8)

    def step(votes, fr):
        uv, m = fr
        return voting_ops.vote_frame(votes, uv, m, dedup=True), None

    votes, _ = jax.lax.scan(step, votes, (uv2pt, masks))
    return votes


@partial(
    jax.jit,
    static_argnames=("depth_hw", "nclasses", "conf_threshold_static"),
    donate_argnums=(0,),
)
def _vote_batch(
    votes: jax.Array,  # [npts, nclasses+1] int32 (donated)
    logits: jax.Array,  # [B, H, W, nclasses+1] f32 model output
    uv2pt: jax.Array,  # [B, Hd*Wd] int32
    depth_hw: Tuple[int, int],
    nclasses: int,
    conf_threshold_static: float,
) -> jax.Array:
    """Jitted logits->votes step (for callers that already hold logits)."""
    return _vote_logits(votes, logits, uv2pt, depth_hw, nclasses,
                        conf_threshold_static)


def stream_segment(
    session,  # io.rtab.SessionData (for the RGB frames)
    segmenter,  # pipeline.get2dseg.Segmenter2D
    uv2pt: np.ndarray,  # [F, Hd*Wd] int32 (fusion artifact, frame order of session)
    npts: int,
    nclasses: int = 133,
    threshold: float = 0.5,
    conf_threshold: float = 0.017,
    filter_classes: Optional[Tuple[int, ...]] = None,
    batch_size: int = 8,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the model over every session frame and vote on device.

    Returns (votes [npts, nclasses+1], classes [npts]) — identical contract
    to vote_session + classify, computed without writing/reading masks.
    """
    import cv2

    ih, iw = segmenter.input_hw
    hd, wd = session.depth_hw
    F = session.nframes
    rgb = session.colors.reshape(F, hd, wd, 3)  # float [0,1] at depth res

    # one compiled program per batch: model forward + confidence rule +
    # resize + vote scan (cached on the segmenter across calls)
    key = ((hd, wd), nclasses, float(conf_threshold), batch_size)
    cache = segmenter.__dict__.setdefault("_stream_step_cache", {})
    step_fn = cache.get(key)
    if step_fn is None:
        @partial(jax.jit, donate_argnums=(1,))
        def step_fn(params, votes, imgs, uv):
            logits = segmenter.model.apply({"params": params}, imgs)
            return _vote_logits(
                votes, logits, uv, (hd, wd), nclasses, conf_threshold
            )

        cache[key] = step_fn

    params = jax.tree.map(jnp.asarray, segmenter.params)  # device-resident
    votes = jnp.zeros((npts, nclasses + 1), jnp.int32)
    uv2pt = np.asarray(uv2pt, np.int32)

    for i in range(0, F, batch_size):
        chunk = rgb[i : i + batch_size]
        pad = batch_size - len(chunk)
        imgs = np.stack(
            [cv2.resize(im, (iw, ih), interpolation=cv2.INTER_LINEAR) for im in chunk]
        ).astype(np.float32)
        uv = uv2pt[i : i + len(chunk)]
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad, ih, iw, 3), np.float32)])
            uv = np.concatenate([uv, np.full((pad, hd * wd), -1, np.int32)])
        votes = step_fn(params, votes, jnp.asarray(imgs), jnp.asarray(uv))
        if verbose:
            print(f"streamed {min(i + batch_size, F)}/{F} frames")

    classes = voting_ops.classify(votes, threshold, nclasses, filter_classes)
    return np.asarray(votes), np.asarray(classes)
