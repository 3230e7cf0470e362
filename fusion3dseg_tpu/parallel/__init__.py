from fusion3dseg_tpu.parallel import label_fuse, sharding, voting  # noqa: F401
