"""2D axial rotary position embeddings (RoPE) for spatial token grids.

SAM2's memory attention uses axial RoPE on its spatial tokens
([external] per SURVEY.md §2c). The head dim splits in half: the first
half rotates by the token's y coordinate, the second by x; each half is
standard 1D RoPE over frequency pairs. Tables are precomputed numpy
constants closed over by jit — zero runtime cost beyond the elementwise
rotate (VPU-fused into the surrounding matmuls).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def axial_rope_tables(side_y: int, side_x: int, head_dim: int,
                      theta: float = 10000.0):
    """(sin, cos) tables of shape (side_y*side_x, head_dim//2) for a
    flattened row-major (y, x) grid. Matches the official SAM2 axial
    RoPE exactly: x (column) frequencies occupy the FIRST half of the
    rotated dim, y (row) frequencies the second half."""
    assert head_dim % 4 == 0, head_dim
    quarter = head_dim // 4
    freqs = theta ** (-np.arange(quarter, dtype=np.float64) / quarter)
    ys = np.arange(side_y, dtype=np.float64)
    xs = np.arange(side_x, dtype=np.float64)
    ang_y = ys[:, None] * freqs[None]                      # (Sy, q)
    ang_x = xs[:, None] * freqs[None]                      # (Sx, q)
    ang = np.concatenate([
        np.broadcast_to(ang_x[None, :, :], (side_y, side_x, quarter)),
        np.broadcast_to(ang_y[:, None, :], (side_y, side_x, quarter)),
    ], axis=-1).reshape(side_y * side_x, head_dim // 2)
    return (np.sin(ang).astype(np.float32),
            np.cos(ang).astype(np.float32))


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray):
    """Rotate pairs. x: (..., S, D); sin/cos: (S, D//2)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(orig)
