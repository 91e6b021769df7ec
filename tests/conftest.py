"""Test harness: force CPU backend with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4). Must run before jax imports."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize pre-imports jax and registers the TPU (axon)
# plugin before conftest runs, so env vars alone are too late; backend
# selection is lazy, so the config update below still wins.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
