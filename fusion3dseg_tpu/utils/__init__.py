from fusion3dseg_tpu.utils import palette, taxonomy, timing  # noqa: F401
