"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU via
``--xla_force_host_platform_device_count`` (the standard fake-multi-device
fixture for pjit/shard_map, filling the testing gap the reference never had
— it shipped with no test suite at all, SURVEY.md section 4).

Must run before jax is imported anywhere.
"""

import os

# Force-set: the environment ships with JAX_PLATFORMS=axon (one real TPU
# chip); tests must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = os.environ.get("HOUSESCAN_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported at interpreter startup (the axon TPU plugin
# registers via a .pth hook), in which case env vars alone are too late.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
