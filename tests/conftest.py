"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding behavior is validated on a virtual device mesh (the
JAX-native fake backend) — no TPU pod needed.  Must run before jax import.
"""

import os

# Force override: the session environment may pin JAX_PLATFORMS to a
# (slow, remote) TPU tunnel; unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have imported jax at interpreter
# start (registering a remote TPU plugin) — jax then read JAX_PLATFORMS
# before the assignment above.  Update the live config too, or the tests
# silently run on the remote TPU (slow, and f32 FFT/reduction results
# differ from the CPU oracles).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
