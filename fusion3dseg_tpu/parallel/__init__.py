from fusion3dseg_tpu.parallel import sharding, voting  # noqa: F401
