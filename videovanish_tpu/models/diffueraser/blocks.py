"""Shared diffusion building blocks (SD1.5 family), flax.linen, NHWC.

These are new TPU-first implementations of the public SD1.5/BrushNet
architecture that the reference consumes through diffusers
(reference call surface: diffuerase.py:39-45; internals [external],
SURVEY.md §2c). Channel-last layout feeds XLA's TPU conv lowering
directly; attention goes through ops.attention (Pallas flash kernel on
TPU); GroupNorm stats stay f32 via ops.group_norm.

Module attribute names mirror diffusers' parameter tree so the weight
converter (core/convert.py) is a pure name map.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.attention import attention as flash_attention
from videovanish_tpu.ops.attention import attention_tokenmajor
from videovanish_tpu.ops.groupnorm import group_norm, group_norm_silu


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers Timesteps semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos \
        else jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear (diffusers TimestepEmbedding)."""
    emb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_2")(x)


class GroupNorm(nn.Module):
    """Parameterized GroupNorm over channel-last input (f32 statistics)."""
    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, fuse_silu: bool = False):
        C = x.shape[-1]
        # SD channel counts are multiples of 32; smoke configs aren't —
        # fall back to the largest compatible group count.
        groups = self.num_groups if C % self.num_groups == 0 \
            else math.gcd(C, self.num_groups)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        fn = group_norm_silu if fuse_silu else group_norm
        return fn(x, scale, bias, groups, self.eps)


class ResnetBlock2D(nn.Module):
    """GN+SiLU+Conv x2 with time-embedding shift and conv shortcut."""
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_ch = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, name="norm1")(x, fuse_silu=True)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :].astype(h.dtype)
        h = GroupNorm(self.groups, self.eps, name="norm2")(h, fuse_silu=True)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention (self or cross) over token-major input.

    x: (B, S, C); context: (B, Sk, Ck) or None for self-attention.
    attn_fn optionally replaces the attention op itself ((B,H,S,D) q/k/v
    -> (B,H,S,D)); used to swap in sequence-parallel ring attention
    (parallel/ring_attention.py) without touching the param tree.
    """
    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[callable] = None

    @nn.compact
    def __call__(self, x, context=None, t_frames: Optional[int] = None):
        if t_frames is not None:
            # Temporal self-attention with (B*T, S, C) token-form
            # input/output. The LayerNorms/PE/FF around this stay in the
            # frame-major form — but INSIDE the attention, everything
            # from the projections to the out-proj is per-token and
            # layout-agnostic, so the input crosses into temporal
            # token-major ((B*S, T, C)) ONCE before to_q/to_k/to_v and
            # back ONCE after to_out. Transposing q/k/v/out separately
            # (4 moves per attention) made the motion modules move
            # ~2 GB/module of pure relayout traffic at 720p: the
            # proj_out/ff HBM fusions ran at 270 GB/s with that traffic
            # folded in (docs/PROFILE_720p.md round-5 dissection).
            BT, S, C = x.shape
            B = BT // t_frames
            inner = self.num_heads * self.head_dim

            # (an optimization_barrier here to force the relayout to
            # materialize was measured SLOWER — 1912 vs 1872 ms/window —
            # than letting XLA propagate transposed layouts; keep the
            # single shared transpose and let layout assignment decide)
            h_tm = x.reshape(B, t_frames, S, C) \
                .transpose(0, 2, 1, 3).reshape(B * S, t_frames, C)
            q = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                         name="to_q")(h_tm)
            k = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                         name="to_k")(h_tm)
            v = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                         name="to_v")(h_tm)

            if self.attn_fn is not None:
                def split(t):
                    t = t.reshape(B * S, t_frames,
                                  self.num_heads, self.head_dim)
                    return t.transpose(0, 2, 1, 3)

                out = self.attn_fn(split(q), split(k), split(v))
                out = out.transpose(0, 2, 1, 3).reshape(
                    B * S, t_frames, inner)
            else:
                out = attention_tokenmajor(q, k, v, self.num_heads)
            out = nn.Dense(self.out_dim or C, dtype=self.dtype,
                           name="to_out_0")(out)
            return out.reshape(B, S, t_frames, -1) \
                .transpose(0, 2, 1, 3).reshape(BT, S, -1)
        B, S, C = x.shape
        # cross-step attention reuse (TGATE/DeepCache-style, PAPERS.md):
        # when the caller provides a recorded "attn_cache" collection,
        # replay the previous PCM step's attention output instead of
        # recomputing q/k/v + the kernel; when the collection is mutable,
        # record this step's output. Steered entirely by how apply() is
        # called (denoise_window, cfg.spatial_attn_reuse) — no param-tree
        # or call-signature change anywhere else.
        if self.has_variable("attn_cache", "out"):
            return self.get_variable("attn_cache", "out")
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype, name="to_v")(ctx)

        if context is None and self.attn_fn is None:
            # token-major self-attention: small-S shapes (temporal
            # attention) run the in-kernel-packed Pallas path with no
            # head-split/packing relayouts in HBM; other shapes fall
            # through to the same flash/XLA dispatch as below
            out = attention_tokenmajor(q, k, v, self.num_heads)
        else:
            def split(t):
                return t.reshape(B, -1, self.num_heads,
                                 self.head_dim).transpose(0, 2, 1, 3)

            impl = self.attn_fn if self.attn_fn is not None \
                else flash_attention
            out = impl(split(q), split(k), split(v))
            out = out.transpose(0, 2, 1, 3).reshape(B, S, inner)
        out = nn.Dense(self.out_dim or C, dtype=self.dtype,
                       name="to_out_0")(out)
        if self.is_mutable_collection("attn_cache"):
            self.put_variable("attn_cache", "out", out)
        return out


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU for torch parity
        gate = nn.gelu(gate.astype(jnp.float32), approximate=False)
        return h * gate.astype(h.dtype)


class FeedForward(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = GEGLU(C * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(C, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> FF, pre-LayerNorm (SD1.5 layout)."""
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype,
                          name="attn1")(h.astype(x.dtype))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype,
                          name="attn2")(h.astype(x.dtype), context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h.astype(x.dtype))
        return x


class Transformer2D(nn.Module):
    """GN -> proj_in -> transformer blocks over H*W tokens -> proj_out (+res)."""
    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        res = x
        h = GroupNorm(32, 1e-6, name="norm")(x)
        # proj_in/proj_out run on the 3D token form: applied in 4D NHWC,
        # XLA rewrites these pointwise Denses as 1x1 convolutions and
        # layout-assigns the activations TRANSPOSED ({2,3,1,0}: W on
        # lanes, C on sublanes) to elide the attention transposes — every
        # projection then streams HBM strided at ~270 GB/s
        # (docs/PROFILE_720p.md round-5 dissection). The (B,H,W,C) ->
        # (B,HW,C) reshape is a free bitcast on contiguous rows.
        h = h.reshape(B, H * W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(self.num_heads, self.head_dim,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(h, context)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + res


class Downsample2D(nn.Module):
    """Stride-2 conv downsample. The VAE encoder uses asymmetric (0,1,0,1)
    padding (floor semantics); the UNet uses symmetric pad=1 (ceil
    semantics) — both per the public SD implementations."""
    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding="VALID", dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=1, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest x2 (or to an explicit target size, so odd skip resolutions
    concat cleanly) + conv."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw: Optional[tuple] = None):
        B, H, W, C = x.shape
        th, tw = out_hw if out_hw is not None else (H * 2, W * 2)
        x = jax.image.resize(x, (B, th, tw, C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv")(x)
