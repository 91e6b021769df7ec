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

# persistent jit cache: no-op on the CPU backend (reloading XLA:CPU AOT
# blobs trips a machine-feature mismatch on this host — see
# core/runtime.apply_compilation_cache); set VV_JIT_CACHE=<dir> to force
from videovanish_tpu.core.runtime import apply_compilation_cache

apply_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
