"""FPN neck + sine position encoding for the SAM2 image encoder
([external] per SURVEY.md §2c: Hiera multiscale -> 256-d pyramid).

Naming/semantics follow the official SAM2 FpnNeck so converted
checkpoints load directly: convs_0 takes the LOWEST-resolution (stride
32) backbone level (the checkpoint's ModuleList is ordered over
backbone_channel_list = [stride32..stride4]); position encoding is the
normalized DETR-style sine embedding with interleaved sin/cos pairs.
"""
from __future__ import annotations


import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sine_pos_embed_2d(h: int, w: int, dim: int,
                      temperature: float = 10000.0) -> np.ndarray:
    """(h, w, dim) normalized sine-cosine 2D positional encoding.

    Matches the official SAM2 position encoding (DETR
    SinePositionEmbedding with normalize=True): coordinates are
    (i+1)/N * 2*pi, frequencies temperature**(2*(k//2)/(dim/2)), and
    sin/cos are INTERLEAVED per frequency; output is [y-half, x-half]."""
    assert dim % 4 == 0
    npf = dim // 2  # num_pos_feats per axis
    eps = 1e-6
    scale = 2.0 * math.pi
    ys = (np.arange(h, dtype=np.float64) + 1.0) / (h + eps) * scale
    xs = (np.arange(w, dtype=np.float64) + 1.0) / (w + eps) * scale
    dim_t = temperature ** (2.0 * (np.arange(npf) // 2) / npf)

    def interleave(v):  # v: (n,) -> (n, npf) with sin/cos pairs
        p = v[:, None] / dim_t[None, :]
        out = np.empty((v.shape[0], npf))
        out[:, 0::2] = np.sin(p[:, 0::2])
        out[:, 1::2] = np.cos(p[:, 1::2])
        return out

    pe_y = interleave(ys)  # (h, npf)
    pe_x = interleave(xs)  # (w, npf)
    pe = np.concatenate([
        np.broadcast_to(pe_y[:, None, :], (h, w, npf)),
        np.broadcast_to(pe_x[None, :, :], (h, w, npf)),
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
        # convs_{n-1-i} laterals xs[i]: checkpoint conv list runs from the
        # coarsest (stride 32) level down, official backbone_channel_list
        laterals = [
            nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                    name=f"convs_{n - 1 - i}")(x)
            for i, x in enumerate(xs)
        ]
        feats = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            f = laterals[i]
            if prev is not None and i in self.top_down_levels:
                B, H, W, C = f.shape
                up = jax.image.resize(prev.astype(jnp.float32),
                                      (B, H, W, C), method="nearest")
                f = f + up.astype(f.dtype)
            feats[i] = f
            prev = f
        pos = [
            jnp.asarray(sine_pos_embed_2d(f.shape[1], f.shape[2],
                                          self.d_model))
            for f in feats
        ]
        return feats, pos
