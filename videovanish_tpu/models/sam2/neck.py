"""FPN neck + sine position encoding for the SAM2 image encoder
([external] per SURVEY.md §2c: Hiera multiscale -> 256-d pyramid)."""
from __future__ import annotations


from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sine_pos_embed_2d(h: int, w: int, dim: int,
                      temperature: float = 10000.0) -> np.ndarray:
    """(h, w, dim) sine-cosine 2D positional encoding (DETR-style)."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (temperature ** (np.arange(quarter) / quarter))
    ys = (np.arange(h, dtype=np.float64) + 1.0)[:, None] * omega[None]
    xs = (np.arange(w, dtype=np.float64) + 1.0)[:, None] * omega[None]
    pe_y = np.concatenate([np.sin(ys), np.cos(ys)], -1)  # (h, dim/2)
    pe_x = np.concatenate([np.sin(xs), np.cos(xs)], -1)  # (w, dim/2)
    pe = np.concatenate([
        np.broadcast_to(pe_y[:, None, :], (h, w, dim // 2)),
        np.broadcast_to(pe_x[None, :, :], (h, w, dim // 2)),
    ], axis=-1)
    return pe.astype(np.float32)


class FpnNeck(nn.Module):
    """1x1 lateral convs to d_model + top-down fusion on the coarse levels.

    Input: Hiera outputs [stride4, stride8, stride16, stride32].
    Output: (feats, pos) lists in the same order, all d_model channels.
    """
    d_model: int = 256
    top_down_levels: Sequence[int] = (2, 3)  # indices receiving top-down
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n = len(xs)
        laterals = [
            nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                    name=f"convs_{i}")(x)
            for i, x in enumerate(xs)
        ]
        feats = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            f = laterals[i]
            if prev is not None and i in self.top_down_levels:
                B, H, W, C = f.shape
                up = jax.image.resize(prev, (B, H, W, C), method="nearest")
                f = f + up
            feats[i] = f
            prev = f
        pos = [
            jnp.asarray(sine_pos_embed_2d(f.shape[1], f.shape[2],
                                          self.d_model))
            for f in feats
        ]
        return feats, pos
