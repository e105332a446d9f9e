"""Test configuration: force CPU with an 8-device virtual mesh.

This is the TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4): sharding/pjit paths are exercised on
``--xla_force_host_platform_device_count=8`` virtual host devices.

Note: the environment's sitecustomize imports jax at interpreter startup
with ``JAX_PLATFORMS=axon`` (real-TPU tunnel), so env vars alone are too
late here — ``jax.config.update`` switches the (lazily initialized)
backend to CPU before any test touches a device.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
