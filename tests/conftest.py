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

# SNN_TEST_PLATFORM=default leaves the interpreter's backend alone
# (the real chip via the axon tunnel) — required for chip-gated runs
# like `RUN_TRAIN_GATE=1` (scripts/run_chip_queue.sh); everything else
# tests on the 8-device virtual CPU mesh.
if os.environ.get("SNN_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Modules whose tests are compile-/fit-bound (measured with
# --durations on a 1-CPU host): excluded from the `smoke` profile so
# `pytest -m smoke` stays under ~5 minutes. Everything else is marked
# smoke automatically; chip-gated tests (train_gate) are always slow.
SLOW_MODULES = {
    "test_bench_smoke",
    "test_cli",
    "test_distributed",
    "test_import_torch_ckpt",
    "test_megakernel",
    "test_model_zoo",
    "test_parity_grad_torch",
    "test_serve",
    "test_train",
    "test_train_gate",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES or item.get_closest_marker("train_gate"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
