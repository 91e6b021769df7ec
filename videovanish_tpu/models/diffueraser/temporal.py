"""AnimateDiff-style motion modules (temporal transformers) for video UNets.

The reference's DiffuEraser inflates the SD1.5 UNet with motion modules
[external per SURVEY.md §2c]: the published `unet_main` checkpoint is a
diffusers `UNetMotionModel`, whose motion modules are initialized from
the AnimateDiff v1-5 adapter and fine-tuned. This module mirrors that
architecture exactly so real weights port 1:1
(tests/fixtures/manifests/diffueraser_unet_main.json pins the key
inventory; conversion via core/convert.UNET_RULES):

  MotionModule (diffusers TransformerTemporalModel layout):
    norm        GroupNorm(32, eps=1e-6) — stats pool over (T, H, W, C/G)
                per clip (torch GN on (B, C, T, H, W) normalizes over
                every non-batch dim)
    proj_in     Linear(C, C)
    transformer_blocks.0:
      norm1 -> +sinusoidal PE -> attn1 (temporal self)
      norm2 -> +sinusoidal PE -> attn2 (temporal self; AnimateDiff's
               ("Temporal_Self","Temporal_Self") pair — attn2 has
               cross_attention_dim=None, i.e. self-attention)
      norm3 -> ff (GEGLU, mult 4)
    proj_out    Linear(C, C)
    + residual around the whole module

TPU-first layout: frames ride the batch axis through the surrounding
conv stack, so everything per-token here (LN, PE add, projections, FF)
runs in the SPATIAL layout (B*T, H, W, C) — the natural row-major layout
of that stack. Only q/k/v cross into (B*H*W, T, C) token-major inside
Attention, right at the packed-kernel boundary. (A transpose-first
formulation lets XLA bitcast the transpose for free and then pays for it
on every LayerNorm/FF in batch-minor layouts — measured ~2x the block's
entire compute at 720p shapes.)

Sequence parallelism over frames (ring attention over ICI) plugs in at
exactly the attention boundary (parallel/ring_attention.py).
"""
from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from videovanish_tpu.models.diffueraser.blocks import (
    Attention, FeedForward, GroupNorm,
)


def sinusoidal_positional_embedding(n: int, dim: int) -> jnp.ndarray:
    """(n, dim) interleaved sin/cos table — diffusers
    SinusoidalPositionalEmbedding (pe[:, 0::2]=sin, pe[:, 1::2]=cos),
    NOT the concatenated-halves timestep embedding."""
    position = np.arange(n, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                      * (-np.log(10000.0) / dim))
    pe = np.zeros((n, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


class TemporalTransformerBlock(nn.Module):
    """norm1 -> +PE -> attn1, norm2 -> +PE -> attn2, norm3 -> ff.
    Input/output (B*T, S, C) token form; attention is over T."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    ring_mesh: object = None
    ring_axis: str = "data"

    @nn.compact
    def __call__(self, x, t_frames: int):
        BT, S, C = x.shape
        B = BT // t_frames
        head_dim = C // self.num_heads

        attn_fn = None
        if self.ring_mesh is not None \
                and self.ring_mesh.shape[self.ring_axis] > 1:
            from videovanish_tpu.parallel.ring_attention import (
                ring_attention_for_mesh,
            )
            attn_fn = ring_attention_for_mesh(self.ring_mesh, self.ring_axis)

        pe = sinusoidal_positional_embedding(t_frames, C)
        pos_bt = jnp.tile(pe, (B, 1))[:, None, :]  # (B*T, 1, C)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = (h + pos_bt).astype(x.dtype)
        x = x + Attention(self.num_heads, head_dim, dtype=self.dtype,
                          attn_fn=attn_fn, name="attn1")(
            h, t_frames=t_frames)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        h = (h + pos_bt).astype(x.dtype)
        x = x + Attention(self.num_heads, head_dim, dtype=self.dtype,
                          attn_fn=attn_fn, name="attn2")(
            h, t_frames=t_frames)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h.astype(x.dtype))
        return x


class MotionModule(nn.Module):
    """Diffusers TransformerTemporalModel: GN -> proj_in -> temporal
    transformer block -> proj_out, residual around the whole module.
    Input (B*T, H, W, C); t_frames is the static clip length.

    ring_mesh: when set (and its ring_axis has size > 1), temporal
    self-attention runs sequence-parallel over the mesh via ring
    attention — each device keeps its resident frames, K/V blocks rotate
    over ICI (parallel/ring_attention.py). t_frames must then be a
    multiple of the ring-axis size. The param tree is identical either
    way."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    ring_mesh: object = None
    ring_axis: str = "data"

    @nn.compact
    def __call__(self, x, t_frames: int):
        BT, H, W, C = x.shape
        B = BT // t_frames
        residual = x
        # torch GroupNorm on (B, C, T, H, W) pools stats over the whole
        # clip (C/G, T, H, W) per batch element: fold T into rows so our
        # per-sample GroupNorm sees the same reduction set.
        h = x.reshape(B, t_frames * H, W, C)
        h = GroupNorm(32, 1e-6, name="norm")(h)
        # 3D token form for the projections and the transformer block:
        # pointwise Denses on 4D NHWC get rewritten by XLA into 1x1
        # convolutions with TRANSPOSED activation layouts (see
        # Transformer2D), and the temporal transposes inside the block
        # then stream strided (docs/PROFILE_720p.md round-5 dissection)
        h = h.reshape(BT, H * W, C).astype(x.dtype)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        h = TemporalTransformerBlock(
            self.num_heads, dtype=self.dtype, ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis, name="transformer_blocks_0")(
            h, t_frames)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(BT, H, W, C) + residual
