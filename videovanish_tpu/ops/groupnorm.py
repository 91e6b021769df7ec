"""GroupNorm (+ fused SiLU) with f32 statistics.

Every ResBlock in the VAE / UNet / BrushNet is GroupNorm->SiLU->Conv.
On TPU the statistics reduction and the normalize+SiLU elementwise chain
are emitted as one fused XLA loop over NHWC; keeping stats in f32 while
activations are bf16 preserves the torch parity the north-star demands.
(A hand-scheduled Pallas variant is only worthwhile fused into the
adjacent conv; XLA already fuses the elementwise tail, so this is the
canonical implementation.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_groups", "eps"))
def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over channel-last input.

    x: (..., C); groups split C. scale/bias: (C,).
    Statistics are computed over all non-batch axes within each group in
    f32 (torch nn.GroupNorm semantics for NCHW inputs transposed to NHWC).
    """
    orig_dtype = x.dtype
    *lead, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    xf = x.astype(jnp.float32).reshape(lead[0], -1, num_groups, C // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps"))
def group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm followed by SiLU, fused into one XLA computation."""
    orig_dtype = x.dtype
    y = group_norm(x, scale, bias, num_groups, eps).astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(orig_dtype)
