"""Precision policy: bf16 compute on the MXU, f32 params + f32 accumulation.

The reference enables bf16 autocast + TF32 on CUDA SM>=8.0
(sam2_masker.py:75-79). The TPU-native equivalent is explicit: modules take
a `Policy`, cast inputs/weights to `compute_dtype` at matmul boundaries,
and keep softmax / normalization statistics in `accum_dtype`.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, *xs):
        out = tuple(x.astype(self.compute_dtype) if x is not None else None for x in xs)
        return out if len(out) > 1 else out[0]

    def cast_to_accum(self, *xs):
        out = tuple(x.astype(self.accum_dtype) if x is not None else None for x in xs)
        return out if len(out) > 1 else out[0]


def default_policy() -> Policy:
    return Policy()


def f32_policy() -> Policy:
    """Full-f32 policy for CPU tests / parity harnesses."""
    return Policy(compute_dtype=jnp.float32)


def cast_params_for_inference(params, compute_dtype=jnp.bfloat16):
    """Cast matmul/conv weights (ndim>=2) to the compute dtype for
    inference: on TPU this halves HBM weight traffic and feeds the MXU
    bf16 directly. 1-D leaves (norm scales/biases) stay f32 so
    normalization math keeps full precision.

    The whole tree is cast in ONE jitted program: per-leaf .astype
    dispatches cost a host-link round trip each through the axon
    tunnel (hundreds of leaves = tens of seconds of init latency)."""
    import jax

    def cast(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.dtype == jnp.float32:
            return x.astype(compute_dtype)
        return x

    return jax.jit(lambda t: jax.tree.map(cast, t))(params)


def zeros_like_shapes(shape_tree):
    """Materialize a pytree of zeros from a tree of ShapeDtypeStructs in
    ONE device program (a per-leaf jnp.zeros loop pays one remote
    dispatch per leaf through the axon tunnel; measured ~60 s for the
    SD-sized UNet tree)."""
    import jax

    def build():
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                            shape_tree)

    return jax.jit(build)()


def policy_from_config(precision_cfg) -> Policy:
    return Policy(
        param_dtype=jnp.dtype(precision_cfg.param_dtype),
        compute_dtype=jnp.dtype(precision_cfg.compute_dtype),
        accum_dtype=jnp.dtype(precision_cfg.accum_dtype),
    )
