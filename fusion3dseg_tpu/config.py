"""Typed per-stage configuration.

The reference has no config system — constants live as keyword defaults
(reference get3DSeg.py:18-22, Fusion3DSeg/process3D.py:14-18) plus hard-coded
paths in __main__ blocks. Here each stage gets one frozen dataclass; defaults
mirror the reference's so a user gets identical behavior out of the box.

These dataclasses are the CANONICAL default record: a drift test
(tests/test_contracts.py) pins each field against the live stage
signatures, so editing a stage default without updating (or consciously
diverging from) the config here fails CI-style.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

# COCO-133 panoptic taxonomy used by the reference's OneFormer wrapper
# (reference get2DSeg.py:111-118: argmax over 133 classes, low-confidence
# pixels relabeled to class 133 "unclassified").
NUM_CLASSES = 133
UNCLASSIFIED = NUM_CLASSES  # = 133


@dataclasses.dataclass(frozen=True)
class Seg2DConfig:
    """2D semantic segmentation stage (reference get2DSeg.py:82-126)."""

    extension: str = "jpg"
    # Softmax-confidence threshold below which a pixel becomes class 133
    # (reference get2DSeg.py:113-118 uses 0.017).
    conf_threshold: float = 0.017
    filter_classes: Optional[Sequence[int]] = None
    num_classes: int = NUM_CLASSES
    # Model inference settings (TPU-side, new design)
    batch_size: int = 8
    image_hw: Tuple[int, int] = (512, 512)
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Multi-view fusion stage (reference Fusion3DSeg/process3D.py:14-18)."""

    radius: float = 0.05  # merge distance threshold [m]
    angle: float = 10.0  # surface-normal merge threshold [deg]
    stride: int = 10  # sparsification patch size [px]
    point_range: Tuple[float, float] = (0.1, 4.0)  # valid depth range [m]
    decimation: int = 1
    min_occ: int = 3  # occurrence-denoise threshold (applied to nmerges)
    # far-plane distance for frustum culling [m]; None = point_range[1]
    # (the reference's far plane, process3D.py:17 — process3DSeg culls at
    # the validity range's upper bound, not an independent knob)
    max_depth: Optional[float] = None
    skip: int = 1  # frame skip
    # TPU-specific: fixed sparse-point capacity (XLA static shapes). The
    # running sparse cloud lives in a padded buffer of this many slots.
    capacity: int = 1 << 20
    # TPU-specific: merge-window overflow policy. "split" covers the oldest
    # + newest visible slots so loop-closure revisits merge instead of
    # duplicating (measured r4: -0.02% vs +94% appended points on a
    # turns=2 orbit; docs/ROUND4.md)
    window_policy: str = "split"
    save_lookups: bool = True


@dataclasses.dataclass(frozen=True)
class VotingConfig:
    """Label-lifting stage (reference get3DSeg.py:18-22, voting.py:75-137)."""

    threshold: float = 0.5  # max_vote/total_votes confidence threshold
    nclasses: int = NUM_CLASSES
    filter_classes: Optional[Sequence[int]] = (86, 114, 115)
    min_pts_per_inst: int = 100
    # Reference parity: NumPy fancy-index `+=` collapses duplicate
    # (point, class) pairs within one frame (reference voting.py:98).
    # True  -> replicate exactly (per-frame presence via scatter-max).
    # False -> count every pixel (np.add.at semantics), slightly faster.
    dedup_per_frame: bool = True


@dataclasses.dataclass(frozen=True)
class InstanceConfig:
    """Connected-component instance split (reference segUtils/cv.py:402-500)."""

    min_pts_per_inst: int = 100
    # Fixed neighbor degree of the radius graph; the reference uses an
    # unbounded KDTree.query_radius list (fusion.py:374-375). 16 covers the
    # observed neighbor counts at r = 2*ds_radius on indoor scans.
    max_degree: int = 16
    # Iteration cap for label propagation (reference BFS is unbounded).
    max_iters: int = 512


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    seg2d: Seg2DConfig = Seg2DConfig()
    fusion: FusionConfig = FusionConfig()
    voting: VotingConfig = VotingConfig()
    instance: InstanceConfig = InstanceConfig()
