from fusion3dseg_tpu.ops import (  # noqa: F401
    components,
    components2d,
    neighbors,
    obb,
    sparsify,
    voting,
    zbuffer,
)
