"""Test configuration: force JAX onto 8 virtual CPU devices.

Must run before jax is imported anywhere, hence the env mutation at module
import time. This is the standard JAX fake-backend pattern for exercising
pjit/shard_map meshes without real TPU chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
