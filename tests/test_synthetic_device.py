"""On-device train-data generation (io/synthetic_device.py, VERDICT r4 #7).

The numpy renderer (io/synthetic.py) is the ORACLE: the device raycast +
textured shading must reproduce it bit-exactly at matched resolutions
(the math is deterministic given the shared per-session tables), and the
device augment must keep the host augment's invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fusion3dseg_tpu.io import synthetic
from fusion3dseg_tpu.io.synthetic_device import (
    augment_batch_device, device_dataset, render_session_device,
)


def _device_render(room, F, hw, model_hw=None):
    boxes, bclasses = synthetic.session_boxes(room)
    ap = {k: jnp.asarray(v) for k, v in
          synthetic.session_appearance(room, len(boxes)).items()}
    eyes, Rs, _ = synthetic.session_poses(room, F)
    sx, sy, sz = room.size
    return render_session_device(
        jnp.asarray(eyes, jnp.float32), jnp.asarray(Rs, jnp.float32),
        jnp.asarray([0.0, 0.0, 0.0, sx, sy, sz], jnp.float32),
        jnp.asarray(boxes.reshape(-1, 6), jnp.float32),
        jnp.asarray(bclasses, jnp.int32), ap,
        render_hw=hw, model_hw=model_hw or hw,
    )


class TestRenderOracle:
    def test_bit_exact_vs_numpy_renderer(self):
        """At render_hw == model_hw the device session must equal
        make_session(appearance='textured') BIT-EXACTLY: same masks, same
        uint8 colors (truncating quantization matched)."""
        for seed in (11, 4096):
            room = synthetic.RoomSpec(seed=seed)
            sess = synthetic.make_session(
                nframes=4, depth_hw=(48, 36), room=room,
                appearance="textured",
            )
            imgs, masks = _device_render(room, 4, (48, 36))
            np.testing.assert_array_equal(np.asarray(masks), sess.gt_mask)
            np.testing.assert_array_equal(np.asarray(imgs), sess.colors)

    def test_resize_path_agrees_with_host_resize(self):
        """The device render->resize (f32 resize then quantize) and the
        host render->cv2 resize (quantize then u8 resize) are different
        pipelines by design; they must still agree closely (same scene,
        same bilinear kernel family) and the masks' class SETS match."""
        import cv2

        room = synthetic.RoomSpec(seed=7)
        sess = synthetic.make_session(
            nframes=2, depth_hw=(96, 72), room=room, appearance="textured")
        imgs, masks = _device_render(room, 2, (96, 72), model_hw=(64, 64))
        host_imgs = np.stack([
            cv2.resize(c, (64, 64), interpolation=cv2.INTER_LINEAR)
            for c in sess.colors
        ])
        d = np.abs(np.asarray(imgs).astype(int) - host_imgs.astype(int))
        # interior pixels agree within a few counts; edges differ by the
        # quantization-ordering difference
        assert np.median(d) <= 2.0, np.median(d)
        assert (d <= 8).mean() > 0.9, (d <= 8).mean()
        assert set(np.unique(np.asarray(masks))) <= set(
            np.unique(sess.gt_mask))

    def test_dataset_batches(self):
        it = device_dataset((64, 64), 4, seed=3, nframes_per_session=8)
        b1, m1 = next(it)
        b2, _ = next(it)
        assert b1.shape == (4, 64, 64, 3) and b1.dtype == jnp.uint8
        assert m1.shape == (4, 64, 64) and m1.dtype == jnp.uint8
        # the room's surface classes appear
        assert {87, 118, 131} <= set(np.unique(np.asarray(m1)).tolist())
        # consecutive batches differ (shuffled frames)
        assert not np.array_equal(np.asarray(b1), np.asarray(b2))


class TestAugmentDevice:
    def test_invariants_match_host_augment(self):
        """Same invariants the host augment_batch holds: uint8 range,
        masks only ever flipped (label values preserved), flips applied
        to image and mask together."""
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 255, (6, 32, 32, 3), np.uint8))
        masks = jnp.asarray(rng.integers(0, 20, (6, 32, 32), np.uint8))
        out, om = augment_batch_device(
            imgs, masks, jax.random.PRNGKey(1), strength=1.0)
        assert out.dtype == jnp.uint8 and om.dtype == jnp.uint8
        om, masks_h = np.asarray(om), np.asarray(masks)
        # each output mask is the input mask or its horizontal flip
        for i in range(6):
            assert (np.array_equal(om[i], masks_h[i])
                    or np.array_equal(om[i], masks_h[i][:, ::-1]))
        # strength>1 cutout keeps labels untouched
        _, om2 = augment_batch_device(
            imgs, masks, jax.random.PRNGKey(2), strength=1.6)
        om2 = np.asarray(om2)
        for i in range(6):
            assert (np.array_equal(om2[i], masks_h[i])
                    or np.array_equal(om2[i], masks_h[i][:, ::-1]))

    def test_train_loop_smoke_device_datagen(self):
        """Two steps of the real train loop with device_datagen on the
        forced-CPU harness: wiring, shapes, loss finite."""
        from fusion3dseg_tpu.models import SegFormerConfig
        from fusion3dseg_tpu.models.train import TrainConfig, train

        cfg = TrainConfig(
            model=SegFormerConfig(
                num_classes=134, embed_dims=(8, 16, 24, 32),
                depths=(1, 1, 1, 1), num_heads=(1, 2, 3, 4),
                decoder_dim=32, dtype=jnp.float32,
            ),
            steps=2, batch_size=2, input_hw=(64, 64),
            render_hws=((64, 48),), device_datagen=True, augment=True,
            warmup_steps=1, prefetch=0,
        )
        _, loss = train(cfg, verbose=False)
        assert np.isfinite(float(np.asarray(loss)))
