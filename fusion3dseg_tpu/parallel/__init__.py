from fusion3dseg_tpu.parallel import fusion, label_fuse, sharding, voting  # noqa: F401
