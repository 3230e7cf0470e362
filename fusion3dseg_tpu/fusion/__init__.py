from fusion3dseg_tpu.fusion.fusion import (  # noqa: F401
    Fusion,
    FusionState,
    fuse_session,
    fuse_sessions_batch,
    load_state,
    save_state,
)
