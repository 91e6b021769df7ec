"""Orbax checkpoint save/load for model pytrees.

The reference downloads torch/HF weights at install/first-run
(install_videovanish.sh:68-70, diffuerase.py:41-44); here converted
weights live as orbax checkpoints (core/convert.py produces them) and
models fall back to seeded random init when a checkpoint is absent so
every pipeline stays runnable end-to-end (smoke configs, CI).
"""
from __future__ import annotations

import os

import jax



def save_pytree(path: str, tree) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like=None):
    """Load a checkpoint; if `like` is given, restore with its structure
    (and shard/dtype layout) as the target."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else like
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def maybe_load(path: str | None, like=None):
    if path and os.path.exists(path):
        return load_pytree(path, like)
    return None
