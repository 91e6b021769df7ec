"""Hiera hierarchical image encoder (SAM2-family), flax.linen, NHWC.

The reference consumes this inside the sam2 package (ckpt
sam2.1_hiera_large.pt, sam2_masker.py:19-20; internals [external] per
SURVEY.md §2c): a windowed-attention ViT with 4 stages, Q-pooling at
stage transitions, a handful of global-attention blocks, and multiscale
outputs at strides 4/8/16/32.

TPU-first notes: window partitioning is pure reshape/transpose (no
gather); all attention goes through ops.attention (Pallas flash kernel);
shapes are static for a fixed input size so the whole encoder is one
XLA program per resolution.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from videovanish_tpu.ops.attention import attention as flash_attention
from videovanish_tpu.ops.attention import attention_tokenmajor


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with padding to multiples of ws."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(x, ws: int, hw_pad, hw):
    Hp, Wp = hw_pad
    H, W = hw
    B = x.shape[0] // ((Hp // ws) * (Wp // ws))
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class PatchEmbed(nn.Module):
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # 7x7 stride-4 conv (Hiera patch embed)
        return nn.Conv(self.embed_dim, (7, 7), strides=(4, 4), padding=3,
                       dtype=self.dtype, name="proj")(x)


class MultiScaleAttention(nn.Module):
    """Windowed (or global) attention with optional 2x2 Q-pooling."""
    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.q_pool:
            q = nn.max_pool(q, (2, 2), strides=(2, 2))
            H, W = q.shape[1], q.shape[2]
        hd = self.dim_out // self.num_heads

        if not self.q_pool:
            # token-major dispatch: for the small windowed sequences
            # (stage-1/4 S=64) the packing and head split stay inside
            # the kernel's VMEM — the (B,H,S,D) head-split transposes on
            # 8k-window batches were ~8-16 ms of HBM relayout per block
            # (PROFILE_SAM2.md); other shapes fall through to the same
            # flash/XLA dispatch as the split path below
            out = attention_tokenmajor(
                q.reshape(B, H * W, self.dim_out),
                k.reshape(B, H * W, self.dim_out),
                v.reshape(B, H * W, self.dim_out), self.num_heads)
            out = out.reshape(B, H, W, self.dim_out)
            return nn.Dense(self.dim_out, dtype=self.dtype,
                            name="proj")(out)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        out = flash_attention(heads(q), heads(k), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    dim_out: int
    num_heads: int
    window_size: int  # 0 = global attention
    q_pool: bool = False
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(x.dtype)

        if self.q_pool:
            shortcut = nn.max_pool(
                nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(h),
                (2, 2), strides=(2, 2))

        if self.window_size > 0:
            hw = (h.shape[1], h.shape[2])
            h, hw_pad = window_partition(h, self.window_size)
            h = MultiScaleAttention(self.dim_out, self.num_heads,
                                    q_pool=self.q_pool, dtype=self.dtype,
                                    name="attn")(h)
            ws = self.window_size // (2 if self.q_pool else 1)
            out_hw = (shortcut.shape[1], shortcut.shape[2])
            out_pad = (hw_pad[0] // (2 if self.q_pool else 1),
                       hw_pad[1] // (2 if self.q_pool else 1))
            h = window_unpartition(h, ws, out_pad, out_hw)
        else:
            h = MultiScaleAttention(self.dim_out, self.num_heads,
                                    q_pool=self.q_pool, dtype=self.dtype,
                                    name="attn")(h)

        x = shortcut + h
        hn = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        mlp = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype,
                       name="mlp_fc1")(hn)
        mlp = nn.gelu(mlp.astype(jnp.float32)).astype(x.dtype)
        mlp = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(mlp)
        return x + mlp


class Hiera(nn.Module):
    """4-stage hierarchical encoder; returns features at strides 4/8/16/32."""
    embed_dim: int = 144
    num_heads: int = 2
    stages: Sequence[int] = (2, 6, 36, 4)
    window_spec: Sequence[int] = (8, 4, 16, 8)
    global_att_blocks: Sequence[int] = (23, 33, 43)
    pos_embed_bkg_size: Sequence[int] = (7, 7)
    pos_embed_window_size: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = PatchEmbed(self.embed_dim, dtype=self.dtype, name="patch_embed")(x)
        B, H, W, C = x.shape

        # absolute pos embed: background grid interpolated (bicubic, as the
        # official implementation does) + tiled window embed
        bkg = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, *self.pos_embed_bkg_size, self.embed_dim))
        win = self.param("pos_embed_window", nn.initializers.normal(0.02),
                         (1, self.pos_embed_window_size,
                          self.pos_embed_window_size, self.embed_dim))
        from videovanish_tpu.ops.resize import resize_bicubic_torch
        pe = resize_bicubic_torch(bkg, H, W)
        tiles_h, tiles_w = -(-H // win.shape[1]), -(-W // win.shape[2])
        pe_win = jnp.tile(win, (1, tiles_h, tiles_w, 1))[:, :H, :W]
        x = x + (pe + pe_win).astype(x.dtype)

        # Layout management: the window partition/unpartition 6D
        # transposes are expensive on TPU (measured ~6 ms per stage-2
        # block pair at 1024^2), and everything in a block EXCEPT
        # attention is per-token. So consecutive windowed blocks run in
        # the PARTITIONED layout (windows ride the batch axis; each block
        # is then just global attention over its ws x ws "image" —
        # identical math and identical parameter tree), converting to the
        # spatial layout only at q-pool entries, global-attention blocks,
        # and stage outputs.
        state = {"x": x, "ws": 0, "pad": None, "hw": None}

        def to_spatial():
            if state["ws"]:
                state["x"] = window_unpartition(
                    state["x"], state["ws"], state["pad"], state["hw"])
                state["ws"] = 0

        def to_windowed(ws):
            if state["ws"] != ws:
                to_spatial()
                h_, w_ = state["x"].shape[1], state["x"].shape[2]
                # The fused partitioned-layout flow is exact only when
                # the grid tiles evenly: window_partition zero-pads, and
                # keeping pad tokens alive across consecutive blocks
                # would accumulate attention/MLP state in them (the
                # reference re-pads fresh zeros per block). All shipped
                # configs divide evenly; guard the latent case.
                if h_ % ws or w_ % ws:
                    raise ValueError(
                        f"Hiera fused windowed layout needs the token "
                        f"grid ({h_}x{w_}) divisible by window {ws}; "
                        f"use an image_size/window_spec that tiles.")
                state["hw"] = (h_, w_)
                state["x"], state["pad"] = window_partition(state["x"], ws)
                state["ws"] = ws

        outputs = []
        dim = self.embed_dim
        heads = self.num_heads
        blk = 0
        for si, depth in enumerate(self.stages):
            for di in range(depth):
                q_pool = si > 0 and di == 0  # pool at stage entry
                if q_pool:
                    dim *= 2
                    heads *= 2
                # stage-entry (pooling) blocks window at the PREVIOUS
                # stage's size — they still see the pre-pool resolution
                ws = self.window_spec[si - 1] if q_pool \
                    else self.window_spec[si]
                wsz = 0 if blk in self.global_att_blocks else ws
                if q_pool or wsz == 0:
                    to_spatial()
                else:
                    to_windowed(wsz)
                    wsz = 0  # pre-windowed: global attention per window
                state["x"] = MultiScaleBlock(dim, heads, wsz, q_pool=q_pool,
                                             dtype=self.dtype,
                                             name=f"blocks_{blk}")(state["x"])
                blk += 1
            to_spatial()
            outputs.append(state["x"])
        return outputs  # strides [4, 8, 16, 32]
