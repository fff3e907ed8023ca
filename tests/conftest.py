"""Test configuration: force JAX onto 8 virtual CPU devices.

The container's axon site hook (PYTHONPATH=/root/.axon_site) registers the
remote-TPU PJRT backend at interpreter startup and pins JAX_PLATFORMS=axon,
with ~tens of seconds of latency per compile — unusable for a test suite.
Since jax is already imported by the time conftest runs, we re-exec pytest
once with the hook stripped and the CPU fake-backend flags set. This is the
standard JAX pattern for exercising pjit/shard_map meshes without real
chips.
"""

import os
import sys

_REEXEC_FLAG = "CLIP_EBC_TEST_REEXEC"

if os.environ.get(_REEXEC_FLAG) != "1":
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )

import numpy as np
import pytest

# Persistent compilation cache: the suite is dominated by XLA CPU compiles
# of full models; caching cuts repeat runs from minutes to seconds.
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/clip_ebc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
