from fusion3dseg_tpu.models.segformer import (  # noqa: F401
    SegFormer,
    SegFormerConfig,
    create_model,
)
