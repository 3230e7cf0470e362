"""On-device synthetic train-data generation (VERDICT r4 #7).

The train loop's binding constraint was host-side data generation: numpy
raycasting at ~190 ms/batch on this single-core host, then a u8 upload
through the ~20-40 MB/s tunnel (CLAUDE.md). This module ports the
render path of io/synthetic.py to JAX so batches are BORN on the TPU:

  * the tiny per-session draws stay host-side numpy and reuse the exact
    extracted helpers (`session_boxes` / `session_appearance` /
    `session_poses`) — the sampled values are identical to make_session's;
  * the raycast + textured shading + resize run as ONE jitted program per
    (frames, render_hw, model_hw) shape — pure elementwise math plus a
    [N, B] slab test, exactly the compiler-friendly form the numpy
    `_raycast` already uses (io/synthetic.py:110-214 is the oracle;
    tests/test_synthetic_device.py pins equivalence);
  * augmentation (flip / affine jitter / gamma / noise / cutout) runs in
    the same program under jax.random — statistically equivalent to
    models/train.augment_batch, not stream-identical (different RNG).

The numpy path remains the oracle and the default; `train --device-datagen`
(models/train.py) switches the producer.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.io.synthetic import (
    CEILING_CLASS, FLOOR_CLASS, WALL_CLASS, RoomSpec, session_appearance,
    session_boxes, session_poses,
)


def _raycast_frame(eye, R, room_box, boxes, bclasses, rays_cam, max_depth):
    """One frame's raycast: the JAX port of synthetic._raycast for shared
    origin + [N,3] dirs, returning (t [N], cls [N] i32, normals [N,3],
    inst [N] i32). Same branch structure, jnp.where instead of boolean
    assignment; identical results up to f32 rounding (oracle-tested)."""
    dirs = rays_cam @ R.T  # [N, 3] world-frame ray directions
    inv = jnp.where(jnp.abs(dirs) > 1e-12, 1.0 / dirs, jnp.float32(1e12))

    # room exit face (largest t still inside; parallel axes never bound)
    rmin, rmax = room_box[:3], room_box[3:]
    t_far = jnp.where(dirs > 0, (rmax - eye) * inv, (rmin - eye) * inv)
    t_far = jnp.where(jnp.abs(dirs) <= 1e-12, jnp.inf, t_far)
    exit_axis = jnp.argmin(t_far, axis=1)
    t_exit = jnp.min(t_far, axis=1)
    face_cls = jnp.where(
        exit_axis == 1,
        jnp.where(dirs[:, 1] > 0, CEILING_CLASS, FLOOR_CLASS),
        WALL_CLASS,
    )
    d_exit = jnp.take_along_axis(dirs, exit_axis[:, None], axis=1)[:, 0]
    hit = t_exit > 0
    t_best = jnp.where(hit & (t_exit < max_depth), t_exit, max_depth)
    cls = jnp.where(hit, face_cls, 0)
    nrm_axis = jnp.where(hit, exit_axis, 0)
    nrm_sign = jnp.where(hit, -jnp.sign(d_exit), 1.0)
    inst = jnp.full(dirs.shape[0], -1, jnp.int32)

    # object boxes: one [N, B] slab test, nearest valid entry wins
    if boxes.shape[0]:
        t1 = (boxes[None, :, :3] - eye[None, None]) * inv[:, None, :]
        t2 = (boxes[None, :, 3:] - eye[None, None]) * inv[:, None, :]
        lo = jnp.minimum(t1, t2)  # [N, B, 3]
        hi = jnp.maximum(t1, t2)
        tmin = jnp.max(lo, axis=2)  # entry t
        tmax = jnp.min(hi, axis=2)  # exit t
        tmin = jnp.where((tmax >= tmin) & (tmin > 1e-6), tmin, jnp.inf)
        b_best = jnp.argmin(tmin, axis=1)  # [N] first minimal-entry box
        tmin_best = jnp.min(tmin, axis=1)
        bhit = tmin_best < t_best
        lo_w = jnp.take_along_axis(
            lo, b_best[:, None, None], axis=1
        )[:, 0, :]  # [N, 3] winner's per-axis entries
        ea = jnp.argmax(lo_w, axis=1)
        d_ea = jnp.take_along_axis(dirs, ea[:, None], axis=1)[:, 0]
        t_best = jnp.where(bhit, tmin_best, t_best)
        cls = jnp.where(bhit, bclasses[b_best], cls)
        nrm_axis = jnp.where(bhit, ea, nrm_axis)
        nrm_sign = jnp.where(bhit, -jnp.sign(d_ea), nrm_sign)
        inst = jnp.where(bhit, b_best, inst)

    t_best = jnp.where(t_best >= max_depth, 0.0, t_best)
    normals = (
        jax.nn.one_hot(nrm_axis, 3, dtype=jnp.float32) * nrm_sign[:, None]
    )
    return t_best, cls.astype(jnp.int32), normals, inst


def _shade_textured(P, cls, inst, normals, ap, vignette):
    """The textured appearance model (synthetic.make_session:400-408):
    per-class sine-field texture, per-instance tint, Lambertian shade off
    the true normals, vignette. Returns [N, 3] float color in [0, 1]."""
    s1 = jnp.sin(jnp.sum(P * ap["tex_k1"][cls], axis=1) + ap["tex_p1"][cls])
    s2 = jnp.sin(jnp.sum(P * ap["tex_k2"][cls], axis=1) + ap["tex_p2"][cls])
    tex = 1.0 + ap["tex_amp"][cls] * (0.7 * s1 + 0.3 * s2)
    shade = ap["ambient"] + (1.0 - ap["ambient"]) * jnp.clip(
        normals @ ap["lite"], 0.0, 1.0
    )
    # inst == -1 (room surfaces) -> the zero tint row appended at the end
    # (numpy's -1 wraps to the last row; make the wrap explicit for jit)
    nt = ap["inst_tint"].shape[0]
    tint = ap["inst_tint"][jnp.where(inst < 0, nt - 1, inst)]
    rgbf = (ap["base_color"][cls] + tint) * (tex * shade * vignette)[:, None]
    return jnp.clip(rgbf, 0.0, 1.0)


@partial(
    jax.jit,
    static_argnames=("render_hw", "model_hw", "max_depth"),
)
def render_session_device(
    eyes: jax.Array,  # [F, 3] f32
    Rs: jax.Array,  # [F, 3, 3] f32
    room_box: jax.Array,  # [6] f32
    boxes: jax.Array,  # [B, 6] f32
    bclasses: jax.Array,  # [B] i32
    appearance: dict,  # session_appearance tables (jnp arrays)
    *,
    render_hw: Tuple[int, int],
    model_hw: Tuple[int, int],
    max_depth: float = 10.0,
) -> Tuple[jax.Array, jax.Array]:
    """Render a whole session on device: raycast + textured shade at
    `render_hw`, then resize to `model_hw` (bilinear images / nearest
    masks — the device analog of synthetic_dataset's cv2 resizes).
    Returns (images [F, h, w, 3] uint8, masks [F, h, w] uint8)."""
    H, W = render_hw
    f = 0.6 * W
    cx, cy = W / 2.0, H / 2.0
    u, v = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        indexing="xy",
    )
    rays_cam = jnp.stack(
        [(u - cx) / f, (v - cy) / f, jnp.ones_like(u)], -1
    ).reshape(-1, 3)
    r2 = ((u - cx) / cx) ** 2 + ((v - cy) / cy) ** 2
    vignette = (1.0 - 0.25 * r2 / jnp.max(r2)).reshape(-1)

    def frame(eye, R):
        t, cls, nrm, inst = _raycast_frame(
            eye, R, room_box, boxes, bclasses, rays_cam, max_depth
        )
        P = eye[None] + t[:, None] * (rays_cam @ R.T)
        rgb = _shade_textured(P, cls, inst, nrm, appearance, vignette)
        return rgb.reshape(H, W, 3), cls.reshape(H, W)

    rgb, cls = jax.vmap(frame)(eyes, Rs)
    h, w = model_hw
    F = rgb.shape[0]
    imgs = jax.image.resize(rgb, (F, h, w, 3), method="bilinear")
    # truncating u8 quantization — the numpy path's clip().astype(uint8)
    # (at render_hw == model_hw the resize is identity and images match
    # the host renderer bit-exactly; tests pin it)
    imgs = jnp.clip(imgs * 255.0, 0, 255).astype(jnp.uint8)
    masks = jax.image.resize(cls, (F, h, w), method="nearest")
    return imgs, masks.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("strength",))
def augment_batch_device(
    imgs: jax.Array,  # [B, h, w, 3] uint8
    masks: jax.Array,  # [B, h, w] uint8
    key: jax.Array,
    strength: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Device port of models/train.augment_batch: flip, contrast/
    brightness/channel-gain jitter, gamma, sensor noise, and (strength >
    1) cutout. Statistically equivalent (same distributions), different
    RNG stream (jax.random vs numpy). Returns uint8 (imgs, masks)."""
    s = float(strength)
    n, h, w, _ = imgs.shape
    ks = jax.random.split(key, 8)
    flip = jax.random.uniform(ks[0], (n,)) < 0.5
    imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)
    masks = jnp.where(flip[:, None, None], masks[:, :, ::-1], masks)
    contrast = jax.random.uniform(
        ks[1], (n, 1, 1, 1), minval=max(0.0, 1 - 0.3 * s), maxval=1 + 0.3 * s
    )
    bright = jax.random.uniform(
        ks[2], (n, 1, 1, 1), minval=-32 * s, maxval=32 * s
    )
    gains = jax.random.uniform(
        ks[3], (n, 1, 1, 3), minval=max(0.0, 1 - 0.15 * s),
        maxval=1 + 0.15 * s,
    )
    out = imgs.astype(jnp.float32) * contrast * gains + bright
    gamma = jnp.exp(0.12 * s * jax.random.normal(ks[4], (n, 1, 1, 1)))
    out = jnp.clip(out, 0.0, 255.0)
    out = 255.0 * (out / 255.0) ** gamma
    sigma = jax.random.uniform(ks[5], (n, 1, 1, 1), maxval=5.0 * s)
    out = out + sigma * jax.random.normal(ks[6], out.shape)
    if s > 1.0:
        # cutout as a coordinate mask (no dynamic shapes): per image a
        # random rectangle of the augment_batch size law, pasted with a
        # random uniform color on a p_cut coin; labels kept
        p_cut = min(0.5, 0.25 * (s - 1.0) + 0.25)
        kc = jax.random.split(ks[7], 6)
        ch = jax.random.randint(
            kc[0], (n, 1, 1), h // 10 + 1, max(h * 3 // 10, h // 10 + 2)
        )
        cw = jax.random.randint(
            kc[1], (n, 1, 1), w // 10 + 1, max(w * 3 // 10, w // 10 + 2)
        )
        y0 = jax.random.randint(kc[2], (n, 1, 1), 0, h) % (h - ch + 1)
        x0 = jax.random.randint(kc[3], (n, 1, 1), 0, w) % (w - cw + 1)
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        inside = ((yy >= y0) & (yy < y0 + ch) & (xx >= x0) & (xx < x0 + cw))
        coin = jax.random.uniform(kc[4], (n, 1, 1)) < p_cut
        color = jax.random.uniform(kc[5], (n, 1, 1, 3), maxval=255.0)
        out = jnp.where((inside & coin)[..., None], color, out)
    return jnp.clip(out, 0, 255).astype(jnp.uint8), masks


def device_dataset(
    hw: Tuple[int, int],
    batch_size: int,
    seed: int = 0,
    nframes_per_session: int = 32,
    render_hws: Tuple[Tuple[int, int], ...] = ((96, 72),),
    augment: bool = False,
    aug_strength: float = 1.0,
    max_depth: float = 10.0,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Infinite (images, masks) DEVICE batches — the on-device analog of
    models/train.synthetic_dataset + augment_batch, with only the tiny
    per-session scalars leaving the host (boxes/poses/appearance tables,
    a few KB, vs ~1.6 MB of pixels per batch through the tunnel).

    Always renders "textured" (the production training regime). Batches
    are device-resident uint8; the train step consumes them with no H2D
    transfer and no host raycast.
    """
    rng = np.random.default_rng(seed)
    nframes_per_session = max(nframes_per_session, batch_size)
    key = jax.random.PRNGKey(seed)
    while True:
        room = RoomSpec(seed=int(rng.integers(1 << 30)))
        boxes, bclasses = session_boxes(room)
        ap = {k: jnp.asarray(v) for k, v in
              session_appearance(room, len(boxes)).items()}
        eyes, Rs, _ = session_poses(room, nframes_per_session)
        sx, sy, sz = room.size
        render_hw = render_hws[int(rng.integers(len(render_hws)))]
        imgs, masks = render_session_device(
            jnp.asarray(eyes, jnp.float32), jnp.asarray(Rs, jnp.float32),
            jnp.asarray([0.0, 0.0, 0.0, sx, sy, sz], jnp.float32),
            jnp.asarray(boxes.reshape(-1, 6), jnp.float32),
            jnp.asarray(bclasses, jnp.int32), ap,
            render_hw=tuple(render_hw), model_hw=tuple(hw),
            max_depth=max_depth,
        )
        order = rng.permutation(nframes_per_session)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            sel = jnp.asarray(order[i : i + batch_size])
            bi, bm = imgs[sel], masks[sel]
            if augment:
                key, k = jax.random.split(key)
                bi, bm = augment_batch_device(bi, bm, k, aug_strength)
            yield bi, bm
