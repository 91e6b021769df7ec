"""Device mesh construction.

The reference has no parallelism at all (SURVEY.md §2e) — single-GPU
cuda/mps/cpu selection at sam2_masker.py:67-73. Here multi-chip is
designed in: a ("data", "model") mesh; frames/chunks shard over `data`,
attention heads / MLP channels over `model`. Collectives are emitted by
pjit/shard_map over ICI — no hand-written comm layer.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def mesh_shape_for(n_devices: int, model_parallel: int = 1) -> tuple[int, int]:
    """Resolve (data, model) sizes for a flat device count."""
    if model_parallel <= 0:
        model_parallel = 1
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} does not divide {n_devices} devices"
        )
    return n_devices // model_parallel, model_parallel


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the given (or all) devices.

    On a single chip this degenerates to a 1x1 mesh; all shardings below
    then become no-ops, so the same pjit'ed code runs everywhere.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    dp, mp = mesh_shape_for(devices.size, model_parallel)
    return Mesh(devices.reshape(dp, mp), (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (frame/batch) axis over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pspec(*axes) -> P:
    return P(*axes)
