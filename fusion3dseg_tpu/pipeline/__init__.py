from fusion3dseg_tpu.pipeline.process3d import process3DSeg  # noqa: F401
from fusion3dseg_tpu.pipeline.get3dseg import (  # noqa: F401
    master_classes,
    panoptic_viz,
    remove_classes,
    segment,
    semantic_viz,
)
from fusion3dseg_tpu.pipeline.merge_bb import merge_bb  # noqa: F401
from fusion3dseg_tpu.pipeline.get2dseg import SegmentImage, Segmenter2D  # noqa: F401
from fusion3dseg_tpu.pipeline import (  # noqa: F401
    correspondence,
    door_window,
    planes,
    refinement,
    streaming,
)
