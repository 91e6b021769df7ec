"""Temporal self-attention (motion-module style) for video UNets.

The reference's DiffuEraser inflates the SD1.5 UNet with temporal
self-attention over the frame axis [external per SURVEY.md §2c;
BASELINE.json north-star]. TPU-first design: frames ride the batch axis
through all spatial modules; here we transpose so the frame axis becomes
the attention sequence — tokens = clip length (static), batch = B*H*W —
which keeps every shape static under jit and maps the (T x T) attention
onto the flash kernel. Sequence parallelism over frames (ring attention
over ICI) plugs in at exactly this boundary (parallel/ring_attention.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from videovanish_tpu.models.diffueraser.blocks import (
    Attention, FeedForward, timestep_embedding,
)


class TemporalAttentionBlock(nn.Module):
    """Pre-LN temporal self-attention + FF, with sinusoidal frame-position
    encoding. Input (B*T, H, W, C); t_frames is the static clip length.

    ring_mesh: when set (and its ring_axis has size > 1), the temporal
    self-attention runs sequence-parallel over the mesh via ring attention
    — each device keeps its resident frames, K/V blocks rotate over ICI
    (parallel/ring_attention.py). t_frames must then be a multiple of the
    ring-axis size. The param tree is identical either way."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    max_frames: int = 64
    ring_mesh: object = None
    ring_axis: str = "data"

    @nn.compact
    def __call__(self, x, t_frames: int):
        BT, H, W, C = x.shape
        B = BT // t_frames
        head_dim = C // self.num_heads

        attn_fn = None
        if self.ring_mesh is not None \
                and self.ring_mesh.shape[self.ring_axis] > 1:
            from videovanish_tpu.parallel.ring_attention import (
                ring_attention_for_mesh,
            )
            attn_fn = ring_attention_for_mesh(self.ring_mesh, self.ring_axis)

        # LayerNorm / position add / projections / FF are all per-token,
        # so they run in the SPATIAL layout (B*T, H, W, C) — the natural
        # row-major layout of the surrounding conv stack. Only q/k/v
        # cross into (B*H*W, T, C) token-major inside Attention, right
        # at the packed-kernel boundary. (The previous transpose-first
        # formulation let XLA bitcast the transpose for free and then
        # pay for it on every LayerNorm/FF in batch-minor layouts —
        # measured ~2x the block's entire compute at 720p shapes.)
        pos = timestep_embedding(
            jnp.arange(t_frames), C, flip_sin_to_cos=False)  # (T, C)
        pos_bt = jnp.tile(pos, (B, 1))[:, None, None, :]     # (B*T,1,1,C)
        hn = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        hn = (hn + pos_bt).astype(x.dtype)
        x = x + Attention(self.num_heads, head_dim, dtype=self.dtype,
                          attn_fn=attn_fn, name="attn")(
            hn, t_frames=t_frames)
        hn = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(hn.astype(x.dtype))
        return x
