from fusion3dseg_tpu.utils import palette, taxonomy, timing, viz  # noqa: F401
