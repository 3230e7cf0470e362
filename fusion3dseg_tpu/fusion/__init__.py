from fusion3dseg_tpu.fusion.fusion import Fusion, FusionState, fuse_session  # noqa: F401
