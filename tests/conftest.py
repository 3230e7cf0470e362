"""Test config: force CPU with 8 virtual devices (SURVEY.md §4).

Multi-device sharding tests run on a fake 8-device CPU mesh — JAX's standard
escape hatch for testing pjit/shard_map without a pod. Must run before jax
is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly so the
# 8 virtual devices take effect.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: every test draws the same deterministic stream
    # regardless of which other tests ran first
    return np.random.default_rng(0)
