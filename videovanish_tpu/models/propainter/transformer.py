"""Sparse spatiotemporal transformer ([external] per SURVEY.md §2c:
ProPainter attends over local neighbor frames + strided global refs).

TPU-first: frame selection (neighbors + refs) happens OUTSIDE jit in the
driver — the transformer itself sees a fixed (T_sel, H, W, C) stack.
Spatially we window-partition (pure reshapes) and attend over
(T_sel * window_tokens) with the flash kernel; soft split/overlap is
replaced by shifted windows on alternating layers (Swin-style), which
XLA handles as cheap rolls.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from videovanish_tpu.models.sam2.hiera import (
    window_partition, window_unpartition,
)
from videovanish_tpu.ops.attention import attention as flash_attention


class TemporalSparseBlock(nn.Module):
    dim: int
    num_heads: int = 4
    window: int = 8
    shift: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (T, H, W, C) — attention over all T within each spatial window."""
        T, H, W, C = x.shape
        res = x
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        if self.shift:
            h = jnp.roll(h, (self.window // 2, self.window // 2), axis=(1, 2))
        wnd, hw_pad = window_partition(h, self.window)      # (T*nW, w, w, C)
        nW = wnd.shape[0] // T
        wnd = wnd.reshape(T, nW, self.window * self.window, C)
        wnd = wnd.transpose(1, 0, 2, 3).reshape(nW, T * self.window ** 2, C)

        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(wnd)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(nW, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        att = flash_attention(heads(q), heads(k), heads(v))
        att = att.transpose(0, 2, 1, 3).reshape(nW, T * self.window ** 2, C)
        att = nn.Dense(C, dtype=self.dtype, name="proj")(att)

        att = att.reshape(nW, T, self.window ** 2, C).transpose(1, 0, 2, 3)
        att = att.reshape(T * nW, self.window, self.window, C)
        att = window_unpartition(att, self.window, hw_pad, (H, W))
        if self.shift:
            att = jnp.roll(att, (-self.window // 2, -self.window // 2),
                           axis=(1, 2))
        x = res + att

        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        h = nn.Dense(C * 4, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class SparseTransformer(nn.Module):
    dim: int
    depth: int = 4
    num_heads: int = 4
    window: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = TemporalSparseBlock(self.dim, self.num_heads, self.window,
                                    shift=(i % 2 == 1), dtype=self.dtype,
                                    name=f"blocks_{i}")(x)
        return x
