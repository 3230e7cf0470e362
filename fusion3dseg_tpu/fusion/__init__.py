from fusion3dseg_tpu.fusion.fusion import (  # noqa: F401
    Fusion,
    FusionState,
    auto_window,
    dedup_state,
    fuse_chunk,
    fuse_session,
    fuse_session_checkpointed,
    fuse_sessions_batch,
    load_state,
    remap_uv2pt,
    save_state,
)
from fusion3dseg_tpu.fusion.fused_pipeline import (  # noqa: F401
    fuse_session_and_vote,
)
