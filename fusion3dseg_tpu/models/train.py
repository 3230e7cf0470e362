"""Training loop for the 2D segmenter (new capability; the reference ships
only external pretrained OneFormer weights, get2DSeg.py:54-55).

Trains SegFormer on (image, mask) pairs — e.g. a synthetic-session dataset
from io/synthetic.py, or any directory of rgb/ + masks/ — with the dp x tp
sharded train step from parallel/sharding.py, orbax checkpointing, and
per-class IoU evaluation. Single-chip it degenerates to a 1x1 mesh; the same
code scales over a Mesh unchanged (GSPMD).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.models.segformer import SegFormer, SegFormerConfig
from fusion3dseg_tpu.parallel import sharding
from fusion3dseg_tpu.utils import timing


@dataclasses.dataclass
class TrainConfig:
    model: SegFormerConfig = SegFormerConfig()
    input_hw: Tuple[int, int] = (256, 256)
    batch_size: int = 8
    learning_rate: float = 6e-5
    steps: int = 1000
    log_every: int = 50
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 500
    seed: int = 0
    appearance: str = "flat"  # synthetic-dataset appearance mode


def synthetic_dataset(
    hw: Tuple[int, int], batch_size: int, seed: int = 0,
    nframes_per_session: int = 32, appearance: str = "flat",
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite (images, masks) batches from procedural room sessions.

    appearance="textured" draws a fresh palette/texture/light per session
    (io/synthetic.py), so the model cannot bind color->class and must learn
    spatial context — the honest training regime (ROADMAP #11)."""
    from fusion3dseg_tpu.io import synthetic

    import cv2

    rng = np.random.default_rng(seed)
    h, w = hw
    while True:
        sess = synthetic.make_session(
            nframes=nframes_per_session,
            depth_hw=(96, 72),
            room=synthetic.RoomSpec(seed=int(rng.integers(1 << 30))),
            appearance=appearance,
        )
        # uint8 over the wire (images normalized on-device by the train
        # step; class ids < 255 fit u8): host->device transfer is the train
        # loop's bandwidth bottleneck under the tunnel
        imgs = np.stack(
            [cv2.resize(c, (w, h), interpolation=cv2.INTER_LINEAR) for c in sess.colors]
        ).astype(np.uint8)
        masks = np.stack(
            [cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST) for m in sess.gt_mask]
        ).astype(np.uint8)
        order = rng.permutation(len(imgs))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            sel = order[i : i + batch_size]
            yield imgs[sel], masks[sel]


def directory_dataset(rgb_dir, mask_dir, hw, batch_size, seed=0):
    """(images, masks) batches from a directory pair (stems matched)."""
    import cv2

    from fusion3dseg_tpu.io import artifacts

    rgb_files, mask_files = artifacts.matched_mask_uv2pt_files(rgb_dir, mask_dir)
    rng = np.random.default_rng(seed)
    h, w = hw
    n = len(rgb_files)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            sel = order[i : i + batch_size]
            imgs = np.stack(
                [
                    cv2.resize(cv2.imread(str(rgb_files[j]))[:, :, ::-1], (w, h))
                    for j in sel
                ]
            )  # uint8; normalized on-device by the train step
            masks = np.stack(
                [
                    cv2.resize(
                        cv2.imread(str(mask_files[j]), 0), (w, h),
                        interpolation=cv2.INTER_NEAREST,
                    )
                    for j in sel
                ]
            )  # uint8 class-id pngs
            yield imgs, masks


def mean_iou(logits: np.ndarray, labels: np.ndarray, num_classes: int) -> float:
    pred = logits.argmax(-1)
    ious = []
    for c in np.unique(labels):
        inter = ((pred == c) & (labels == c)).sum()
        union = ((pred == c) | (labels == c)).sum()
        if union:
            ious.append(inter / union)
    return float(np.mean(ious)) if ious else 0.0


def evaluate_synthetic(
    segmenter,
    nsessions: int = 4,
    nframes: int = 16,
    seed: int = 990_000,
    appearance: str = "textured",
    num_classes: int = 134,
):
    """Held-out evaluation: mean IoU + pixel accuracy of a Segmenter2D over
    fresh sessions whose seeds never appear in training (training draws
    seeds < 2^30; eval seeds start at 990_000_000 + seed).

    Returns {"miou": float, "pixel_acc": float, "per_class_iou": dict}.
    """
    from fusion3dseg_tpu.io import synthetic

    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    correct = total = 0
    for s in range(nsessions):
        sess = synthetic.make_session(
            nframes=nframes, depth_hw=(96, 72),
            room=synthetic.RoomSpec(seed=990_000_000 + seed + s),
            appearance=appearance,
        )
        gts = sess.gt_mask.astype(np.int64)
        # predict_batch resizes through the model input and returns masks at
        # the original resolution
        preds = segmenter.predict_batch(sess.colors).astype(np.int64)
        for c in range(num_classes):
            p, g = preds == c, gts == c
            inter[c] += (p & g).sum()
            union[c] += (p | g).sum()
        correct += (preds == gts).sum()
        total += gts.size
    present = union > 0
    iou = inter[present] / union[present]
    return {
        "miou": float(iou.mean()),
        "pixel_acc": float(correct / total),
        "per_class_iou": {
            int(c): float(i)
            for c, i in zip(np.nonzero(present)[0], iou)
        },
    }


def train(
    config: TrainConfig = TrainConfig(),
    dataset: Optional[Iterator] = None,
    mesh=None,
    verbose: bool = True,
):
    """Run the training loop; returns (params, final loss)."""
    mesh = mesh or sharding.make_mesh(len(jax.devices()))
    model = SegFormer(config.model)
    params, opt_state, step, shardings = sharding.init_sharded_train(
        model, mesh, input_hw=config.input_hw, learning_rate=config.learning_rate,
        rng=config.seed,
    )
    if dataset is None:
        dataset = synthetic_dataset(
            config.input_hw, config.batch_size, config.seed,
            appearance=config.appearance,
        )

    loss = None
    t0 = time.perf_counter()
    for it in range(config.steps):
        images, masks = next(dataset)
        images = jax.device_put(jnp.asarray(images), shardings["data"])
        masks = jax.device_put(jnp.asarray(masks), shardings["data"])
        with timing.span("train.step"):
            params, opt_state, loss = step(params, opt_state, images, masks)
        if verbose and (it + 1) % config.log_every == 0:
            lval = float(np.asarray(loss))
            rate = (it + 1) / (time.perf_counter() - t0)
            print(f"step {it + 1}/{config.steps} loss={lval:.4f} ({rate:.2f} it/s)")
        if config.checkpoint_dir and (it + 1) % config.checkpoint_every == 0:
            from fusion3dseg_tpu.pipeline.get2dseg import save_checkpoint

            save_checkpoint(config.checkpoint_dir, params)
    if config.checkpoint_dir:
        from fusion3dseg_tpu.pipeline.get2dseg import save_checkpoint

        save_checkpoint(config.checkpoint_dir, params)
    return params, (float(np.asarray(loss)) if loss is not None else None)
