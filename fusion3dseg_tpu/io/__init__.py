from fusion3dseg_tpu.io import artifacts, ply, rtab, synthetic, tum  # noqa: F401
