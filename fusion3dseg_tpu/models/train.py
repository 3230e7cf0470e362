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
    upright: bool = False  # corrected camera convention (ROADMAP #13)
    # at-scale knobs (ROADMAP #7): warmup + cosine decay to 10% of peak,
    # decoupled weight decay, host-side augmentation, and full train-state
    # resume (params + opt state + step via orbax) for long multi-session
    # runs
    lr_schedule: str = "cosine"  # "cosine" | "constant"
    warmup_steps: int = 200
    weight_decay: float = 0.01
    augment: bool = False
    aug_strength: float = 1.0  # scales every augment_batch jitter range
    # loss up-weight for pixels touching a GT label edge (1.0 = plain CE);
    # targets the boundary-dominated residual error (docs/ROUND4.md item 2)
    boundary_weight: float = 1.0
    # exponential-moving-average decay for an eval/export param tree
    # (0 = off); updated inside the step program (parallel/sharding.py)
    ema_decay: float = 0.0
    # raycast resolutions sampled per session (synthetic dataset only);
    # multiple entries = multi-sharpness training (see synthetic_dataset)
    render_hws: Tuple[Tuple[int, int], ...] = ((96, 72),)
    resume: bool = False
    # warm-start params from an npz snapshot (save_params_npz layout — e.g.
    # an import-hf conversion of an externally pretrained encoder). Ignored
    # when an orbax resume state exists; optimizer state starts fresh.
    init_params_npz: Optional[str] = None
    # batches prepared ahead by a producer thread (0 = synchronous). Host
    # batch synthesis (~190 ms raycast+resize+augment) otherwise serializes
    # with the step's host->device upload (~60-100 ms of socket writes that
    # release the GIL under the tunnel) — the producer thread overlaps them
    prefetch: int = 2
    # generate batches ON DEVICE (io/synthetic_device.py, VERDICT r4 #7):
    # raycast + shade + resize + augment run as device programs, so the
    # host raycast (~190 ms/batch on this single core) and the ~1.6 MB/
    # batch tunnel upload both disappear — only per-session KB-scale
    # tables transfer. Implies appearance="textured" (the production
    # regime); augmentation is statistically equivalent to the host path
    # (jax.random vs numpy streams). The host path stays the oracle.
    device_datagen: bool = False


def make_optimizer(config: TrainConfig):
    """adamw with the configured schedule (shared by train() and resume)."""
    import optax

    if config.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=config.learning_rate,
            warmup_steps=min(config.warmup_steps, max(config.steps // 10, 1)),
            decay_steps=config.steps,
            end_value=0.1 * config.learning_rate,
        )
    else:
        sched = config.learning_rate
    return optax.adamw(sched, weight_decay=config.weight_decay)


# pregenerated unit-normal pool for augment_batch's sensor noise: drawing
# fresh standard_normal per batch is the single most expensive host op in
# the data path (44 of 82 ms/batch at 8x256² on this core); random offsets
# into a fixed pool are statistically equivalent for augmentation and cost
# one strided add. Lazily sized to 2x the largest batch requested.
_NOISE_POOL: Optional[np.ndarray] = None


def _noise_like(shape, rng: np.random.Generator) -> np.ndarray:
    global _NOISE_POOL
    need = int(np.prod(shape))
    if _NOISE_POOL is None or _NOISE_POOL.size < 2 * need:
        _NOISE_POOL = np.random.default_rng(0xF00D).standard_normal(
            max(2 * need, 1 << 20), dtype=np.float32
        )
        # read-only: callers receive a VIEW into the shared pool — an
        # in-place mutation would silently corrupt every later draw
        _NOISE_POOL.setflags(write=False)
    off = int(rng.integers(0, _NOISE_POOL.size - need + 1))
    return _NOISE_POOL[off : off + need].reshape(shape)


def augment_batch(
    imgs: np.ndarray, masks: np.ndarray, rng: np.random.Generator,
    strength: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side photometric + flip augmentation on uint8 batches.

    Geometry-preserving per-image ops only (the masks are dense per-pixel
    labels): horizontal flip, brightness/contrast jitter, channel gains,
    gamma jitter, sensor noise, and (at strength > 1) cutout occluders.
    Cheap numpy arithmetic — the train loop overlaps it with the device
    step.

    `strength` scales every jitter range; 1.0 reproduces the r2/r3 recipe
    plus mild gamma+noise, >1 is the hardened regime for long B2 schedules
    (r4 — boundary-dominated residual error responds to model quality, not
    decision rules; docs/ROUND4.md item 2)."""
    s = float(strength)
    imgs = imgs.copy()
    n = len(imgs)
    flip = rng.random(n) < 0.5
    imgs[flip] = imgs[flip, :, ::-1]
    masks = masks.copy()
    masks[flip] = masks[flip, :, ::-1]
    # per-image contrast in 1±0.3s, brightness in ±32s, per-channel gain in
    # 1±0.15s — composed as one affine LUT-free pass
    # lower bounds clamp at 0 (like gains) so large strengths widen the
    # jitter without ever inverting polarity
    contrast = rng.uniform(
        max(0.0, 1 - 0.3 * s), 1 + 0.3 * s, (n, 1, 1, 1)
    ).astype(np.float32)
    bright = rng.uniform(-32 * s, 32 * s, (n, 1, 1, 1)).astype(np.float32)
    gains = rng.uniform(
        max(0.0, 1 - 0.15 * s), 1 + 0.15 * s, (n, 1, 1, 3)
    ).astype(np.float32)
    out = imgs.astype(np.float32) * contrast * gains + bright
    # gamma jitter on the normalized image (tone-curve variation the affine
    # pass cannot express)
    gamma = np.exp(rng.normal(0.0, 0.12 * s, (n, 1, 1, 1))).astype(np.float32)
    out = np.clip(out, 0.0, 255.0)
    out = 255.0 * (out / 255.0) ** gamma
    # additive sensor noise, per-image sigma in [0, 5s] (pool-sampled)
    sigma = rng.uniform(0.0, 5.0 * s, (n, 1, 1, 1)).astype(np.float32)
    out += _noise_like(out.shape, rng) * sigma
    if s > 1.0:
        # cutout: paste a random uniform-color rectangle over the IMAGE only
        # (labels kept — random erasing for dense prediction: the model must
        # infer the occluded class from context; never larger than 30% of a
        # side so most of every object survives)
        h, w = out.shape[1:3]
        p_cut = min(0.5, 0.25 * (s - 1.0) + 0.25)
        for i in np.nonzero(rng.random(n) < p_cut)[0]:
            ch = int(rng.integers(h // 10 + 1, max(h * 3 // 10, h // 10 + 2)))
            cw = int(rng.integers(w // 10 + 1, max(w * 3 // 10, w // 10 + 2)))
            y0 = int(rng.integers(0, h - ch + 1))
            x0 = int(rng.integers(0, w - cw + 1))
            out[i, y0 : y0 + ch, x0 : x0 + cw] = rng.uniform(0, 255, 3).astype(
                np.float32
            )
    return np.clip(out, 0, 255).astype(np.uint8), masks


def synthetic_dataset(
    hw: Tuple[int, int], batch_size: int, seed: int = 0,
    nframes_per_session: int = 32, appearance: str = "flat",
    upright: bool = False,
    render_hws: Tuple[Tuple[int, int], ...] = ((96, 72),),
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Infinite (images, masks) batches from procedural room sessions.

    appearance="textured" draws a fresh palette/texture/light per session
    (io/synthetic.py), so the model cannot bind color->class and must learn
    spatial context — the honest training regime (ROADMAP #11).

    `render_hws`: raycast resolutions sampled per session. Every frame is
    resized to `hw` for the model, so this controls the upsample factor —
    i.e. texture/boundary sharpness. Training only at 96x72 bakes in one
    blur level while the pipeline consumes 128x96+ captures (the bench's
    model-in-the-loop session); mixing resolutions closes that domain gap
    (r4, docs/ROUND4.md item 2)."""
    from fusion3dseg_tpu.io import synthetic

    import cv2

    rng = np.random.default_rng(seed)
    h, w = hw
    # a session must hold at least one full batch, or the yield loop below
    # is empty and the generator would spin raycasting rooms forever
    nframes_per_session = max(nframes_per_session, batch_size)
    while True:
        sess = synthetic.make_session(
            nframes=nframes_per_session,
            depth_hw=render_hws[int(rng.integers(len(render_hws)))],
            room=synthetic.RoomSpec(seed=int(rng.integers(1 << 30))),
            appearance=appearance,
            upright=upright,
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


def prefetch_batches(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` in a daemon producer thread, up to `depth` items ahead.

    Order-preserving (single producer), exception-propagating (a raised
    exception re-raises at the consumer's next pull), and shutdown-safe
    (closing the generator unblocks a producer stuck on a full queue).
    Used by `train` to overlap host batch synthesis with the train step's
    host->device upload; the raycast/cv2/numpy work and the tunnel's
    socket writes both release the GIL, so one extra thread suffices.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def producer():
        try:
            while not stop.is_set():
                q.put(next(it))
        except BaseException as e:  # noqa: BLE001 — includes StopIteration
            q.put(e)
        finally:
            # run the source's cleanup from the thread that executes it (a
            # generator can only be closed while not mid-execution — this
            # thread is the one that runs it, so here is the only safe spot)
            close = getattr(it, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass

    t = threading.Thread(target=producer, daemon=True,
                         name="train-batch-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, StopIteration):
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:  # free one slot so a producer blocked on put() can exit
            q.get_nowait()
        except queue.Empty:
            pass


def directory_dataset(rgb_dir, mask_dir, hw, batch_size, seed=0):
    """(images, masks) batches from a directory pair (stems matched)."""
    import cv2

    from fusion3dseg_tpu.io import artifacts

    rgb_files, mask_files = artifacts.matched_mask_uv2pt_files(rgb_dir, mask_dir)
    rng = np.random.default_rng(seed)
    h, w = hw
    n = len(rgb_files)
    if n < batch_size:
        raise ValueError(
            f"directory_dataset: {n} matched image/mask pairs is fewer than "
            f"batch_size={batch_size} — the batch loop would never yield"
        )
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
    upright: bool = False,
):
    """Held-out evaluation: mean IoU + pixel accuracy of a Segmenter2D over
    fresh sessions whose seeds never appear in training (training draws
    seeds uniformly BELOW 2^30, train loop above; eval seeds start AT
    2^30, so disjointness holds by construction).

    Returns {"miou": float, "pixel_acc": float, "per_class_iou": dict}.
    """
    from fusion3dseg_tpu.io import synthetic

    inter = np.zeros(num_classes, np.int64)
    union = np.zeros(num_classes, np.int64)
    correct = total = 0
    for s in range(nsessions):
        sess = synthetic.make_session(
            nframes=nframes, depth_hw=(96, 72),
            room=synthetic.RoomSpec(seed=(1 << 30) + seed + s),
            appearance=appearance,
            upright=upright,
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


def save_train_state(checkpoint_dir, params, opt_state, it: int,
                     ema=None, input_hw=None) -> None:
    """Full resumable snapshot (params + optimizer state + step count).

    Atomic commit protocol (review finding r2 — the fusion checkpoint's
    marker protocol, fusion/fusion.py): params and opt_state land in
    step-named directories FIRST, step.txt (the single commit point) is
    written after both, and older snapshots are pruned only then. A crash
    mid-save leaves the previous commit fully intact — params and
    opt_state can never come from different steps. <dir>/params is
    maintained as a symlink to the committed snapshot so the
    Segmenter2D(checkpoint_dir=...) layout keeps working.

    `ema` (optional EMA param tree) additionally commits ema_params_<it>
    and maintains <dir>/ema/params — a directory Segmenter2D can take as
    checkpoint_dir unchanged, so the EMA weights evaluate/ship through
    every existing loader."""
    import os
    import shutil
    from pathlib import Path

    import orbax.checkpoint as ocp

    d = Path(checkpoint_dir)
    d.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    pdir, odir = f"params_{it:08d}", f"opt_state_{it:08d}"
    edir = f"ema_params_{it:08d}"
    ckptr.save(d.absolute() / pdir, params, force=True)
    flat, _ = jax.tree.flatten(opt_state)
    ckptr.save(d.absolute() / odir, flat, force=True)
    if ema is not None:
        ckptr.save(d.absolute() / edir, ema, force=True)
    ckptr.wait_until_finished()
    # commit point — tmp + os.replace so a mid-write crash can never leave
    # a truncated step.txt (which would brick --resume)
    stmp = d / ".step_tmp"
    stmp.write_text(str(it))
    os.replace(stmp, d / "step.txt")

    def _swap_link(link: Path, target: str) -> None:
        if link.exists() and not link.is_symlink():
            shutil.rmtree(link)  # legacy pre-r3 real directory
        tmp = link.parent / f".{link.name}_tmp"
        if tmp.is_symlink() or tmp.exists():
            tmp.unlink()
        os.symlink(target, tmp)
        os.replace(tmp, link)  # atomic swap of the compatible view

    _swap_link(d / "params", pdir)
    if input_hw is not None:
        # record the trained input size so Segmenter2D defaults to it
        # (VERDICT r4 weak#1); <dir>/ema resolves through the same sidecar
        # via checkpoint_input_hw's parent lookup
        from fusion3dseg_tpu.pipeline.get2dseg import write_checkpoint_meta

        write_checkpoint_meta(d, input_hw)
    if ema is not None:
        (d / "ema").mkdir(exist_ok=True)
        _swap_link(d / "ema" / "params", os.path.join("..", edir))
    keep = {pdir, odir}
    prune = list(d.glob("params_????????")) + list(d.glob("opt_state_????????"))
    if ema is not None:
        # prune stale EMA snapshots only when committing a fresh one: a run
        # continued WITHOUT --ema-decay must not destroy the EMA weights a
        # previous run committed (they stay at their old step; load_ema
        # returns None for them, so resume never mixes steps silently)
        keep.add(edir)
        prune += list(d.glob("ema_params_????????"))
    for p in prune:
        if p.name not in keep:
            shutil.rmtree(p, ignore_errors=True)


def load_train_state(checkpoint_dir, like_params, like_opt_state):
    """Restore (params, opt_state, step) saved by save_train_state; the
    `like_*` trees come from a fresh init and fix structure/shape/dtype.
    Understands both the committed step-named layout and the legacy flat
    layout (<dir>/params + <dir>/opt_state)."""
    from pathlib import Path

    import orbax.checkpoint as ocp

    d = Path(checkpoint_dir)
    it = int((d / "step.txt").read_text())
    ckptr = ocp.StandardCheckpointer()
    pdir = d / f"params_{it:08d}"
    params = ckptr.restore(
        (pdir if pdir.is_dir() else d / "params").absolute(),
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like_params
        ),
    )
    flat, treedef = jax.tree.flatten(like_opt_state)
    flat_like = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat]
    odir = d / f"opt_state_{it:08d}"
    restored = ckptr.restore(
        (odir if odir.is_dir() else d / "opt_state").absolute(), flat_like
    )
    opt_state = jax.tree.unflatten(treedef, restored)
    return params, opt_state, it


def load_ema(checkpoint_dir, like_params):
    """Restore the committed EMA param tree, or None when the snapshot has
    none (run trained with ema_decay=0 or pre-EMA layout)."""
    from pathlib import Path

    import orbax.checkpoint as ocp

    d = Path(checkpoint_dir)
    it = int((d / "step.txt").read_text())
    edir = d / f"ema_params_{it:08d}"
    if not edir.is_dir():
        return None
    return ocp.StandardCheckpointer().restore(
        edir.absolute(),
        jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like_params
        ),
    )


def train(
    config: TrainConfig = TrainConfig(),
    dataset: Optional[Iterator] = None,
    mesh=None,
    verbose: bool = True,
):
    """Run the training loop; returns (params, final loss)."""
    from pathlib import Path

    mesh = mesh or sharding.make_mesh(len(jax.devices()))
    model = SegFormer(config.model)
    params, opt_state, step, shardings = sharding.init_sharded_train(
        model, mesh, input_hw=config.input_hw, rng=config.seed,
        optimizer=make_optimizer(config),
        boundary_weight=config.boundary_weight,
        ema_decay=config.ema_decay,
    )
    ema = None
    start = 0
    if (
        config.resume
        and config.checkpoint_dir
        and (Path(config.checkpoint_dir) / "step.txt").exists()
    ):
        host_p, host_o, start = load_train_state(
            config.checkpoint_dir, params, opt_state
        )
        params = jax.tree.map(jax.device_put, host_p, shardings["params"])
        opt_state = jax.tree.map(jax.device_put, host_o, shardings["opt_state"])
        if config.ema_decay > 0:
            host_e = load_ema(config.checkpoint_dir, params)
            if host_e is not None:
                ema = jax.tree.map(jax.device_put, host_e, shardings["params"])
        if verbose:
            print(f"resumed from step {start}")
    elif config.init_params_npz:
        from fusion3dseg_tpu.pipeline.get2dseg import load_params_npz

        host_p = load_params_npz(config.init_params_npz)
        params = jax.tree.map(jax.device_put, host_p, shardings["params"])
        if verbose:
            print(f"initialized params from {config.init_params_npz}")
    if config.ema_decay > 0 and ema is None:
        # one jitted copy program: `ema = params` would alias the donated
        # params buffer; eager per-leaf copies cost a dispatch per leaf
        ema = shardings["ema_init"](params)
    device_gen = dataset is None and config.device_datagen
    if dataset is None:
        if config.device_datagen:
            from fusion3dseg_tpu.io.synthetic_device import device_dataset

            # device batches: no host augment, no producer thread, no
            # upload — the generator's programs run on the same device
            # queue as the step and overlap via async dispatch
            batches = device_dataset(
                config.input_hw, config.batch_size, config.seed + start,
                render_hws=config.render_hws, augment=config.augment,
                aug_strength=config.aug_strength,
            )
        else:
            dataset = synthetic_dataset(
                config.input_hw, config.batch_size, config.seed + start,
                appearance=config.appearance, upright=config.upright,
                render_hws=config.render_hws,
            )
    if not device_gen:
        aug_rng = np.random.default_rng(config.seed + 7 + start)

        def _augmented():
            # augmentation runs in the producer thread too — it is host
            # numpy work that should overlap the consumer's upload, and
            # the single producer keeps the aug_rng draw order (and thus
            # the batch sequence) identical to the synchronous path
            while True:
                images, masks = next(dataset)
                if config.augment:
                    images, masks = augment_batch(
                        images, masks, aug_rng, strength=config.aug_strength
                    )
                yield images, masks

        batches = _augmented()
        if config.prefetch > 0:
            batches = prefetch_batches(batches, depth=config.prefetch)

    loss = None
    last_saved = -1
    t0 = time.perf_counter()
    try:
        for it in range(start, config.steps):
            images, masks = next(batches)
            images = jax.device_put(jnp.asarray(images), shardings["data"])
            masks = jax.device_put(jnp.asarray(masks), shardings["data"])
            # no timing span here: step() returns at dispatch and
            # block_until_ready does not block on the axon platform, so a
            # span would record microseconds and contradict the printed
            # it/s rate — the log line's wall-clock rate is the honest one
            if ema is not None:
                params, opt_state, ema, loss = step(
                    params, opt_state, ema, images, masks
                )
            else:
                params, opt_state, loss = step(params, opt_state, images, masks)
            if verbose and (it + 1) % config.log_every == 0:
                lval = float(np.asarray(loss))
                rate = (it + 1 - start) / (time.perf_counter() - t0)
                print(f"step {it + 1}/{config.steps} loss={lval:.4f} ({rate:.2f} it/s)")
            if config.checkpoint_dir and (it + 1) % config.checkpoint_every == 0:
                save_train_state(config.checkpoint_dir, params, opt_state,
                                 it + 1, ema=ema, input_hw=config.input_hw)
                last_saved = it + 1
    finally:
        # stop the producer thread on EVERY exit (step dispatch error,
        # checkpoint IO failure, KeyboardInterrupt) — it would otherwise
        # keep raycasting (and starving this single-core host) until its
        # queue refills, then block on put() forever
        batches.close()
    if config.checkpoint_dir and last_saved != config.steps:
        # skip the duplicate final save when the loop's last iteration
        # already committed this exact state (a full orbax serialize costs
        # minutes for b1 through the tunnel host)
        save_train_state(config.checkpoint_dir, params, opt_state,
                         config.steps, ema=ema, input_hw=config.input_hw)
    return params, (float(np.asarray(loss)) if loss is not None else None)
