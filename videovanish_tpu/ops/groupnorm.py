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

    TPU note: the big tensor is only ever touched in its native NHWC
    layout (spatial reductions keep C on the lanes); the per-group
    reshape happens on the tiny (B, C) moment vectors. The naive
    (B, HW, G, C/G) reshape lowers the lane width to C/G and was
    measured 17x slower than HBM roofline at VAE-decoder shapes.
    """
    orig_dtype = x.dtype
    C = x.shape[-1]
    B = x.shape[0]
    assert C % num_groups == 0, (C, num_groups)
    cg = C // num_groups
    spatial = tuple(range(1, x.ndim - 1))

    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=spatial) if spatial else xf          # (B, C)
    s2 = jnp.mean(jnp.square(xf), axis=spatial) if spatial \
        else jnp.square(xf)
    # group moments on the tiny (B, C) arrays
    m_g = jnp.mean(s1.reshape(B, num_groups, cg), axis=-1)      # (B, G)
    e2_g = jnp.mean(s2.reshape(B, num_groups, cg), axis=-1)
    var_g = jnp.maximum(e2_g - jnp.square(m_g), 0.0)
    m_c = jnp.repeat(m_g, cg, axis=-1)                          # (B, C)
    r_c = jax.lax.rsqrt(var_g + eps)
    r_c = jnp.repeat(r_c, cg, axis=-1)

    shape = (B,) + (1,) * len(spatial) + (C,)
    a = (r_c * scale.astype(jnp.float32)[None]).reshape(shape)
    b = (bias.astype(jnp.float32)[None]
         - m_c * r_c * scale.astype(jnp.float32)[None]).reshape(shape)
    return (xf * a + b).astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps"))
def group_norm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm followed by SiLU, fused into one XLA computation."""
    orig_dtype = x.dtype
    y = group_norm(x, scale, bias, num_groups, eps).astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(orig_dtype)
