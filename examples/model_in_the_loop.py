"""BASELINE config 4 end-to-end: trained 2D model -> masks -> fusion -> 3D.

Train first (writes the checkpoint dir):

    python -m fusion3dseg_tpu train --steps 8000 --model b1 \
        --appearance textured --augment --checkpoint-dir /tmp/seg2d_ckpt

then:

    python examples/model_in_the_loop.py /tmp/seg2d_ckpt b1 textured

Measured on one TPU v5e.

Flat appearance (fixed per-class colors — the 2D task partly reduces to a
color lookup; kept for pipeline-mechanics comparison):

    steps  model  final loss  2D pixel acc (unseen)  3D agreement  unclassified
     400    b0      0.126           0.9651               0.8806       0.0092
    1500    b0      0.014           0.9950               0.9554       0.0055

Textured appearance (per-session random palettes + procedural textures +
lighting + vignetting: color is uninformative across sessions, so the model
must use spatial context — the honest perception regime; "3D agreement" is
vs the ground-truth-mask pipeline on the same fused cloud):

    steps  model  held-out mIoU  2D pixel acc (unseen)  3D agreement  unclassified
    8000    b1       0.8165            0.9884              0.9719        0.0002
   14000    b2       0.8492            0.9903              0.9752        0.0002
   22000    b2       0.8857              —                 0.9889        0.0000

(the 22000-step row is the r4 boundary-weighted EMA fine-tune — 8000
further steps from the 14000-step snapshot at aug-strength 1.5,
boundary-weight 3, lr 2e-5, mixed 96x72/128x96 render resolutions; the
shipped npz re-measured 3D agreement 0.9889 / 0.9866 on the two unseen
eval sessions, docs/ROUND4.md)

(256^2 input, batch 8, warmup-cosine 6e-5, flip+photometric augmentation,
class-conditional shape-prior rooms; the b2 run resumed from its 8000-step
checkpoint — full train-state resume — for the last 6000 steps. B2
held-out per-class IoU over 8 fresh sessions: surfaces 0.99, couch 0.97,
tv 0.95, door 0.94, windows 0.88-0.90; the keyboard class is subpixel at
the 96x72 render resolution and scores 0.04.)
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def log(*a):
    print(*a, file=sys.stderr, flush=True)


from fusion3dseg_tpu.io import synthetic
from fusion3dseg_tpu.models.segformer import SegFormerConfig
from fusion3dseg_tpu.pipeline import get3dseg, process3d
from fusion3dseg_tpu.pipeline.get2dseg import SegmentImage, Segmenter2D


def main(checkpoint_dir="/tmp/seg2d_ckpt", model="b0", appearance="flat"):
    out = Path(tempfile.mkdtemp())
    work_m = Path(tempfile.mkdtemp())
    work_g = Path(tempfile.mkdtemp())
    # a room seed never seen in training (training draws seeds < 2^30 from
    # its own stream; this fixed seed is held out by convention, and the
    # eval harness proper uses seeds >= 990_000_000 — train.py)
    sess = synthetic.make_session(
        nframes=32, depth_hw=(128, 96), room=synthetic.RoomSpec(seed=777),
        appearance=appearance,
    )
    synthetic.write_session_dir(sess, out)

    seg = Segmenter2D(
        config=SegFormerConfig.named(model), checkpoint_dir=checkpoint_dir,
        input_hw=(256, 256), batch_size=8,
    )
    SegmentImage(str(out / "rgb"), str(out / "model_masks"), segmenter=seg, batch_size=8)

    import cv2

    accs = [
        (cv2.imread(str(out / "model_masks" / f"{i}.png"), 0) == sess.gt_mask[i]).mean()
        for i in range(sess.nframes)
    ]
    log(f"2D pixel accuracy on unseen room ({appearance}): {np.mean(accs):.4f}")

    kw = dict(radius=0.08, angle=20, stride=8, point_range=(0.1, 8.0), capacity=1 << 17)
    process3d.process3DSeg(out, work_m, **kw)
    get3dseg.segment(work_m, out / "model_masks", filter_classes=None,
                     min_pts_per_inst=30, verbose=False)
    process3d.process3DSeg(out, work_g, **kw)
    get3dseg.segment(work_g, out / "masks", filter_classes=None,
                     min_pts_per_inst=30, verbose=False)

    cm = np.load(work_m / "segmentation" / "classes.npy")
    cg = np.load(work_g / "segmentation" / "classes.npy")
    log(f"3D classes: model-masks vs gt-masks agreement: {(cm == cg).mean():.4f}")
    log(f"unclassified fraction (model path): {(cm == 133).mean():.4f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
