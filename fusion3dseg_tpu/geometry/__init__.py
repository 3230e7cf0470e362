from fusion3dseg_tpu.geometry import quaternion, camera, intersections  # noqa: F401
