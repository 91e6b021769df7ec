"""Sharding rules: how model params and activations lay out on the mesh.

The reference has zero parallelism (SURVEY.md §2e). Here:
  - "data"  axis: frames / temporal clips (DP; also the sequence axis for
    temporal attention — sequence parallelism shares this axis)
  - "model" axis: tensor parallelism over attention heads and MLP hidden
    (Megatron-style column/row split, expressed purely as NamedShardings —
    pjit/XLA insert the all-reduces over ICI)

Rules are name-based over the flax param tree, so the same function
shards UNet, BrushNet, VAE and SAM2 params.
"""
from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videovanish_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec builder) — first match wins. Specs are for the
# param's last two axes (Dense kernels are (in, out)); biases follow.
_COLUMN = re.compile(
    r"(to_q|to_k|to_v|net_0/proj|linear_1)/kernel$")
_ROW = re.compile(
    r"(to_out_0|net_2|linear_2)/kernel$")
_COLUMN_BIAS = re.compile(
    r"(to_q|to_k|to_v|net_0/proj|linear_1)/bias$")


def _spec_for(path: str, ndim: int) -> P:
    if ndim >= 2 and _COLUMN.search(path):
        return P(*([None] * (ndim - 1)), MODEL_AXIS)   # split output dim
    if ndim >= 2 and _ROW.search(path):
        return P(*([None] * (ndim - 2)), MODEL_AXIS, None)  # split input dim
    if ndim == 1 and _COLUMN_BIAS.search(path):
        return P(MODEL_AXIS)
    return P()  # replicated (convs, norms, embeddings)


def param_sharding_rules(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    specs = {}
    for kp, leaf in flat:
        specs[path_str(kp)] = _spec_for(path_str(kp), leaf.ndim)

    def assign(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the rules."""
    return jax.device_put(params, param_sharding_rules(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard one batch axis (frames/clips) over "data"."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))
