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


def put_batch(mesh: Mesh | None, a):
    """device_put `a` sharded over "data" on its leading (frame/batch)
    axis when the axis tiles evenly over the mesh; replicated on the
    mesh otherwise (uneven device_put is rejected by jax — uneven
    intermediates instead shard via with_sharding_constraint inside the
    jitted programs, which GSPMD pads internally). No-op without a mesh.
    """
    if mesh is None:
        return a
    if a.shape[0] % mesh.shape[DATA_AXIS] == 0:
        return jax.device_put(a, NamedSharding(mesh, P(DATA_AXIS)))
    return jax.device_put(a, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# multi-host (SURVEY.md §5 distributed-backend row)
# ---------------------------------------------------------------------------
def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host entry point: jax.distributed.initialize, driven by
    args or the VV_COORDINATOR / VV_NUM_PROCESSES / VV_PROCESS_ID env
    vars (set by the launcher on each host). Single-process runs are a
    no-op. Returns True when distributed mode was initialized.

    After this, jax.devices() spans every host's chips; meshes built
    below shard over all of them with XLA collectives riding ICI within
    a slice and DCN across slices.
    """
    import os

    coordinator_address = coordinator_address \
        or os.environ.get("VV_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("VV_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("VV_PROCESS_ID", "0"))
    if not coordinator_address or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def plan_hybrid_mesh(n_slices: int, devices_per_slice: int,
                     model_parallel: int = 1) -> tuple[tuple[int, int],
                                                       tuple[int, int]]:
    """Axis layout for a multi-slice ("hybrid") mesh, pure function.

    Returns ((dcn_data, dcn_model), (ici_data, ici_model)): the slow DCN
    network only ever carries the data axis (gradient/batch collectives,
    which amortize); model parallelism must stay inside a slice, where
    tensor-sized collectives ride ICI.
    """
    if model_parallel > devices_per_slice:
        raise ValueError(
            f"model_parallel={model_parallel} cannot span slices "
            f"({devices_per_slice} devices per slice): TP collectives "
            "must ride ICI, not DCN")
    if devices_per_slice % max(1, model_parallel):
        raise ValueError(
            f"model_parallel={model_parallel} does not divide "
            f"{devices_per_slice} devices per slice")
    return ((n_slices, 1),
            (devices_per_slice // max(1, model_parallel),
             max(1, model_parallel)))


def make_hybrid_mesh(n_slices: int | None = None,
                     model_parallel: int = 1) -> Mesh:
    """("data", "model") mesh over a multi-slice deployment.

    With n_slices > 1, uses mesh_utils.create_hybrid_device_mesh so the
    device order keeps each slice's devices contiguous (DCN-adjacent
    axis outermost); the data axis then spans slices while model stays
    intra-slice, per plan_hybrid_mesh. Falls back to the flat mesh on a
    single slice.
    """
    devices = jax.devices()
    if not n_slices or n_slices <= 1:
        return make_mesh(devices, model_parallel=model_parallel)
    per_slice = len(devices) // n_slices
    dcn, ici = plan_hybrid_mesh(n_slices, per_slice, model_parallel)
    from jax.experimental import mesh_utils
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=ici, dcn_mesh_shape=dcn, devices=devices)
    # shape (dcn_data*ici_data, model) after merging the two data axes
    arr = arr.reshape(dcn[0] * ici[0], ici[1])
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
