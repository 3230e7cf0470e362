from fusion3dseg_tpu.ops import (  # noqa: F401
    components,
    neighbors,
    obb,
    sparsify,
    voting,
    zbuffer,
)
