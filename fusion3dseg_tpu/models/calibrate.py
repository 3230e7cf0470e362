"""Confidence-threshold calibration for the 2D segmenter (VERDICT r3 #2).

The reference hard-codes conf_threshold=0.017 for OneFormer
(get2DSeg.py:82): pixels whose softmax confidence falls below it become
class 133 and never vote. That constant was tuned for a different model
family; this module calibrates it for OURS by sweeping the threshold
through the full model-in-the-loop protocol (fuse an unseen synthetic
session with GT geometry, lift labels through the model's masks, compare
per-point classes against the GT-mask vote).

Cost trick: the sweep is nearly free. Fusion and inference run ONCE per
session (threshold 0 keeps the raw argmax + per-pixel confidence); each
candidate threshold is then just a `where(conf < t, unclassified, argmax)`
relabel + a re-vote, no model forwards.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

DEFAULT_THRESHOLDS = (0.0, 0.005, 0.01, 0.017, 0.03, 0.05, 0.1, 0.2, 0.35)


def sweep_conf_threshold(
    segmenter,
    thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
    session_seeds: Sequence[int] = (777, 7781, 9913),
    nframes: int = 24,
    depth_hw=(128, 96),
    radius: float = 0.08,
    angle_deg: float = 20.0,
    max_depth: float = 8.0,
    capacity: int = 1 << 16,
    vote_threshold: float = 0.5,
    nclasses: int = 133,
    verbose: bool = False,
):
    """Sweep conf_threshold through the model-in-the-loop 3D protocol.

    Returns a list of dicts (one per threshold): mean/min 3D agreement vs
    the GT-mask vote across sessions, mean unclassified point fraction,
    mean unclassified PIXEL fraction. Sessions use RoomSpec seeds outside
    the training distribution (train uses sequential small seeds; the
    defaults here match bench.py's unseen-session convention, seed 777).
    """
    import cv2

    from fusion3dseg_tpu.fusion import fusion as fusion_engine
    from fusion3dseg_tpu.io import rtab, synthetic
    from fusion3dseg_tpu.ops import voting

    hd, wd = depth_hw
    ih, iw = segmenter.input_hw
    per_threshold = {float(t): [] for t in thresholds}

    for seed in session_seeds:
        sess = synthetic.make_session(
            nframes=nframes, depth_hw=depth_hw,
            room=synthetic.RoomSpec(seed=seed), appearance="textured",
        )
        sd = rtab.SessionData.from_arrays(
            sess.colors, sess.depth, sess.K,
            sess.quats_wxyz[:, [1, 2, 3, 0]], sess.translations,
        )
        valid = (sd.depth > 0.1) & (sd.depth <= max_depth)
        st, uv2pt = fusion_engine.fuse_session(
            jnp.asarray(sd.Ks, jnp.float32), jnp.asarray(sd.quats_wxyz),
            jnp.asarray(sd.translations), jnp.asarray(sd.points),
            jnp.asarray(sd.normals), jnp.asarray(sd.colors),
            jnp.asarray(valid),
            height=hd, width=wd, radius=radius,
            min_cosine=float(np.cos(np.deg2rad(angle_deg))),
            max_depth=max_depth, capacity=capacity,
        )
        n = int(np.asarray(st.n))
        uv2pt = jnp.asarray(np.asarray(uv2pt))

        _, classes_g = voting.vote_and_classify(
            uv2pt, jnp.asarray(sess.gt_mask.reshape(nframes, -1)),
            capacity, nclasses, threshold=vote_threshold,
            filter_classes=None,
        )
        classes_g = np.asarray(classes_g)[:n]

        # ONE inference pass at threshold 0: raw argmax + confidence
        rgb = (sess.colors.reshape(nframes, hd, wd, 3) * 255).astype(
            np.uint8)
        sems = np.empty((nframes, hd, wd), np.uint8)
        confs = np.empty((nframes, hd, wd), np.float32)
        bs = segmenter.batch_size
        for i in range(0, nframes, bs):
            chunk = rgb[i : i + bs]
            nreal = len(chunk)
            if nreal < bs:  # pad to the compiled batch width
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[:1], bs - nreal, axis=0)])
            resized = np.stack([
                cv2.resize(im, (iw, ih), interpolation=cv2.INTER_LINEAR)
                for im in chunk
            ]).astype(np.float32) / 255.0
            # (sem, conf)-only program: no full-res logits output and no
            # connected-components fixpoint loop — the sweep needs neither
            sem, conf = segmenter._infer_conf(
                segmenter.params, jnp.asarray(resized), jnp.float32(0.0),
                hd, wd,
            )
            sems[i : i + nreal] = np.asarray(sem)[:nreal]
            confs[i : i + nreal] = np.asarray(conf)[:nreal]

        for t in thresholds:
            masks = np.where(confs < t, nclasses, sems).reshape(nframes, -1)
            _, classes_m = voting.vote_and_classify(
                uv2pt, jnp.asarray(masks), capacity, nclasses,
                threshold=vote_threshold, filter_classes=None,
            )
            classes_m = np.asarray(classes_m)[:n]
            rec = {
                "agreement": float(np.mean(classes_m == classes_g)),
                "unclassified_points": float(np.mean(classes_m == nclasses)),
                "unclassified_pixels": float(np.mean(masks == nclasses)),
            }
            per_threshold[float(t)].append(rec)
            if verbose:
                print(f"seed {seed} t={t:.3f}: {rec}")

    rows = []
    for t in thresholds:
        recs = per_threshold[float(t)]
        rows.append({
            "conf_threshold": float(t),
            "agreement_mean": float(np.mean([r["agreement"] for r in recs])),
            "agreement_min": float(np.min([r["agreement"] for r in recs])),
            "unclassified_points_mean": float(
                np.mean([r["unclassified_points"] for r in recs])),
            "unclassified_pixels_mean": float(
                np.mean([r["unclassified_pixels"] for r in recs])),
            "sessions": len(recs),
        })
    return rows


def pick_threshold(
    rows, max_unclassified: float = 0.01
) -> Optional[dict]:
    """The calibrated operating point: best mean agreement among thresholds
    whose unclassified-point fraction stays within budget; ties break to
    the SMALLER threshold (fewer pixels silenced)."""
    ok = [r for r in rows
          if r["unclassified_points_mean"] <= max_unclassified]
    if not ok:
        return None
    return max(ok, key=lambda r: (r["agreement_mean"], -r["conf_threshold"]))
