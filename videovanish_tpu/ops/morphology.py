"""Binary morphology on-device.

The reference dilates masks on CPU with
`scipy.ndimage.binary_dilation(m, iterations=k)` (diffuerase.py:30), whose
default structuring element is the 4-connected cross
(`generate_binary_structure(2, 1)`). Here it is an iterated cross-shaped
max-filter — pure elementwise shifts, fused by XLA onto the VPU, batched
over frames.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dilate_once_cross(m: jnp.ndarray) -> jnp.ndarray:
    """One 4-connected dilation step of a (..., H, W) bool/0-1 mask."""
    up = jnp.pad(m[..., 1:, :], [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])
    dn = jnp.pad(m[..., :-1, :], [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])
    lf = jnp.pad(m[..., :, 1:], [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])
    rt = jnp.pad(m[..., :, :-1], [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])
    return m | up | dn | lf | rt


@functools.partial(jax.jit, static_argnames=("iterations",))
def binary_dilation(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Iterated 4-connected binary dilation.

    mask: (..., H, W) any dtype; nonzero = foreground. Returns bool.
    Matches scipy.ndimage.binary_dilation(mask>0, iterations=k) with the
    default structuring element (reference diffuerase.py:30).
    """
    m = mask > 0 if mask.dtype != jnp.bool_ else mask
    if iterations <= 0:
        return m
    # Unrolled python loop: `iterations` is static and small (default 8).
    for _ in range(iterations):
        m = _dilate_once_cross(m)
    return m


@functools.partial(jax.jit, static_argnames=("iterations",))
def binarize_and_dilate(mask_rgb: jnp.ndarray, iterations: int = 8) -> jnp.ndarray:
    """Reference mask prep (diffuerase.py:26-31): any-channel>0 then dilate.

    mask_rgb: (..., H, W, 3) uint8. Returns (..., H, W) uint8 in {0, 255}.
    """
    m = jnp.any(mask_rgb > 0, axis=-1)
    m = binary_dilation(m, iterations)
    return m.astype(jnp.uint8) * jnp.uint8(255)
