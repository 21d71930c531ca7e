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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
