"""2D connected components on the image grid (jittable, batched).

The reference's 2D wrapper returns panoptic/instance outputs straight from
OneFormer (get2DSeg.py:60-78: ``sem, pan, inst = outputs.values()``). Our
segmenter is semantic-only, so panoptic segments are derived from the
semantic mask: connected components of equal-class pixels (4-connectivity)
for the "thing" classes, one segment per present "stuff" class.

TPU-native formulation: hook + pointer-jump label propagation. Every pixel
starts as its own root (flat index); each iteration takes (a) the min label
over the 4 equal-class neighbors — four padded shifts, no gathers at pixel
rank — then (b) two pointer jumps ``lbl = lbl[lbl]`` (labels are root pixel
ids, so one [P]-wide gather hops to the current root's label), giving
O(log diameter) convergence instead of O(diameter) for plain diffusion.
A lax.while_loop runs to fixpoint; at fixpoint every component carries its
min flat index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def label_components_2d(
    classes: jax.Array,
    guide: jax.Array | None = None,
    guide_jump: float = 0.0,
) -> jax.Array:
    """Connected components of an integer class image.

    Args:
      classes: [H, W] integer class ids (any non-negative values; pixels
        join a component only across equal-class 4-neighbor edges).
      guide: optional [H, W] or [H, W, C] float discontinuity channel
        (depth, color, ...). When given, an equal-class edge additionally
        requires max_c |guide[p] - guide[q]| <= guide_jump — so two
        TOUCHING same-class objects separated by a depth step or a color
        boundary stop fusing into one segment (VERDICT r4 #8; the
        reference gets this separation from OneFormer's instance branch,
        get2DSeg.py:60-78). For a RELATIVE depth gate pass log-depth with
        guide_jump = log(1 + rel).
      guide_jump: max allowed per-channel |difference| across an edge.

    Returns:
      [H, W] int32 labels — the min flat pixel index of each component
      (unique per component, stable under any pixel ordering).
    """
    H, W = classes.shape
    P = H * W
    classes = classes.astype(jnp.int32)
    sent = jnp.int32(P)  # sentinel > any real label
    idx = jnp.arange(P, dtype=jnp.int32).reshape(H, W)
    # pad classes once with -1 (never equal to a non-negative class)
    cpad = jnp.pad(classes, 1, constant_values=-1)
    shifts = ((1, 0), (-1, 0), (0, 1), (0, -1))
    if guide is not None:
        g = guide.astype(jnp.float32)
        if g.ndim == 2:
            g = g[..., None]
        gpad = jnp.pad(g, ((1, 1), (1, 1), (0, 0)))

    def body(state):
        lbl, _ = state
        lpad = jnp.pad(lbl, 1, constant_values=P)
        best = lbl
        for dy, dx in shifts:
            ncls = jax.lax.dynamic_slice(cpad, (1 + dy, 1 + dx), (H, W))
            nlbl = jax.lax.dynamic_slice(lpad, (1 + dy, 1 + dx), (H, W))
            edge = ncls == classes
            if guide is not None:
                ng = jax.lax.dynamic_slice(
                    gpad, (1 + dy, 1 + dx, 0), (H, W, gpad.shape[2])
                )
                edge = edge & (
                    jnp.max(jnp.abs(ng - g), axis=-1) <= guide_jump
                )
            best = jnp.minimum(best, jnp.where(edge, nlbl, sent))
        flat = best.ravel()
        # pointer jumping: flat[p] is a pixel in p's component (labels only
        # ever propagate across same-class edges), so chasing it twice
        # contracts chains geometrically
        flat = flat[flat]
        flat = flat[flat]
        new = flat.reshape(H, W)
        return new, jnp.any(new != lbl)

    lbl, _ = jax.lax.while_loop(lambda s: s[1], body, (idx, jnp.bool_(True)))
    return lbl


def label_components_2d_batch(
    classes: jax.Array,
    guide: jax.Array | None = None,
    guide_jump: float = 0.0,
) -> jax.Array:
    """[B, H, W] batched variant (vmapped while_loop: iterates until the
    slowest image converges; extra iterations are idempotent). `guide` is
    [B, H, W] / [B, H, W, C] — see label_components_2d."""
    if guide is None:
        return jax.vmap(label_components_2d)(classes)
    return jax.vmap(
        lambda c, g: label_components_2d(c, g, guide_jump)
    )(classes, guide)


def panoptic_from_semantic(
    sem: np.ndarray,
    n_thing: int = 80,
    unclassified: int = 133,
    components: np.ndarray | None = None,
    min_area: int = 0,
):
    """Assemble OneFormer-style panoptic outputs from a semantic mask.

    Matches the reference predict contract (get2DSeg.py:69-78): returns
    ``(idimage, info)`` where idimage is [H, W] int32 segment ids (0 =
    void/unclassified) and info is ``[{'id', 'isthing', 'category_id',
    'area'}, ...]``. Thing classes (contiguous COCO ids < `n_thing`) split
    into per-component segments; stuff classes get one segment each.

    Args:
      sem: [H, W] integer class-id image (may include `unclassified`).
      components: optional precomputed label_components_2d(sem) (np); when
        None it is computed here (CPU fallback via jit on the host array).
      min_area: thing components smaller than this fold into void (0 keeps
        everything, the reference does no area filtering either).
    """
    sem = np.asarray(sem)
    if components is None:
        components = np.asarray(label_components_2d(jnp.asarray(sem)))
    else:
        components = np.asarray(components)

    idimage = np.zeros(sem.shape, np.int32)
    info = []
    next_id = 1

    # single-pass assignment: one unique(return_inverse) per family instead
    # of a full-image boolean rescan per segment (a noisy VGA mask can have
    # hundreds of components)
    thing = (sem < n_thing) & (sem != unclassified)
    if thing.any():
        roots, inverse, counts = np.unique(
            components[thing], return_inverse=True, return_counts=True
        )
        seg_id = np.zeros(len(roots), np.int32)  # 0 = folded into void
        for k, (root, area) in enumerate(zip(roots.tolist(), counts.tolist())):
            if area < min_area:
                continue
            seg_id[k] = next_id
            info.append({
                "id": next_id, "isthing": True,
                "category_id": int(sem.flat[root]), "area": int(area),
            })
            next_id += 1
        idimage[thing] = seg_id[inverse]

    stuff = (~thing) & (sem != unclassified)
    if stuff.any():
        cids, inverse, counts = np.unique(
            sem[stuff], return_inverse=True, return_counts=True
        )
        seg_id = np.zeros(len(cids), np.int32)
        for k, (cid, area) in enumerate(zip(cids.tolist(), counts.tolist())):
            seg_id[k] = next_id
            info.append({
                "id": next_id, "isthing": False,
                "category_id": int(cid), "area": int(area),
            })
            next_id += 1
        idimage[stuff] = seg_id[inverse]

    return idimage, info


def instances_from_panoptic(
    idimage: np.ndarray, info, conf: np.ndarray | None = None
):
    """OneFormer-style instance outputs from a panoptic split.

    Returns a dict mirroring detectron2's Instances fields
    (get2DSeg.py:74-78 note): ``pred_classes`` [K], ``pred_masks``
    [K, H, W] bool, ``scores`` [K] — things only, score = mean per-pixel
    confidence over the mask (1.0 when no confidence map is given).
    """
    idimage = np.asarray(idimage)
    things = [s for s in info if s["isthing"]]
    K = len(things)
    h, w = idimage.shape
    masks = np.zeros((K, h, w), bool)
    classes = np.zeros(K, np.int64)
    scores = np.ones(K, np.float32)
    for k, s in enumerate(things):
        m = idimage == s["id"]
        masks[k] = m
        classes[k] = s["category_id"]
        if conf is not None and m.any():
            scores[k] = float(np.asarray(conf)[m].mean())
    return {"pred_classes": classes, "pred_masks": masks, "scores": scores}
