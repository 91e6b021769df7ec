"""BrushNet conditioning branch, flax.linen, NHWC.

BrushNet-style dual-branch inpainting conditioning (the reference gets
this inside lixiaowen/diffuEraser's UNet [external per SURVEY.md §2c]):
a clone of the UNet that sees [noisy latent(4), masked-image latent(4),
downsampled mask(1)] = 9 input channels, conditioned on the same text
embedding as the main UNet (upstream BrushNet keeps the UNet's
cross-attention layers in the branch; this also keeps attn2 a cheap
77-token cross-attention instead of a second full spatial
self-attention — measured 2x per transformer at 720p latents), and
emits per-stage features through zero-initialized 1x1 convs that the
main UNet adds at its skip/mid/up stages.

The published DiffuEraser brushnet checkpoint is a frame-wise (image)
BrushNetModel — temporal motion modules live in the main UNet only — so
use_temporal defaults to False; the flag stays for experiments (the
MotionModule architecture is shared with the UNet).

Outputs align with UNetCondition's injection points:
  down: 13 tensors (conv_in + 12 down residuals)
  mid:  1 tensor
  up:   12 tensors (one per up-block resnet output)
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from videovanish_tpu.models.diffueraser.blocks import (
    ResnetBlock2D, Transformer2D, Downsample2D, Upsample2D,
    TimestepEmbedding, timestep_embedding,
)
from videovanish_tpu.models.diffueraser.temporal import MotionModule


class ZeroConv(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="conv")(x)


class BrushNetModel(nn.Module):
    """Returns (down_feats, mid_feat, up_feats) for UNetCondition."""
    in_channels: int = 9  # noisy latent + masked-image latent + mask
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    use_temporal: bool = False
    ring_mesh: object = None  # mesh for sequence-parallel temporal attention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 t_frames: int = 1):
        ch = tuple(self.block_out_channels)
        n_blocks = len(ch)
        heads = self.num_attention_heads
        temporal = self.use_temporal and t_frames > 1

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(t_emb.astype(self.dtype))

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample)
        down_feats = [ZeroConv(ch[0], dtype=self.dtype,
                               name="zero_down_0")(h)]
        down_res = [h]
        zi = 1

        for i, c in enumerate(ch):
            has_attn = i < n_blocks - 1
            pre = f"down_blocks_{i}"
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, dtype=self.dtype,
                                  name=f"{pre}_resnets_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(heads, c // heads, dtype=self.dtype,
                                      name=f"{pre}_attentions_{j}")(
                        h, encoder_hidden_states)
                if temporal:
                    h = MotionModule(
                        heads, ring_mesh=self.ring_mesh, dtype=self.dtype,
                        name=f"{pre}_motion_modules_{j}")(h, t_frames)
                down_feats.append(ZeroConv(c, dtype=self.dtype,
                                           name=f"zero_down_{zi}")(h))
                zi += 1
                down_res.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(c, dtype=self.dtype,
                                 name=f"{pre}_downsamplers_0")(h)
                down_feats.append(ZeroConv(c, dtype=self.dtype,
                                           name=f"zero_down_{zi}")(h))
                zi += 1
                down_res.append(h)

        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(heads, ch[-1] // heads, dtype=self.dtype,
                          name="mid_block_attentions_0")(
            h, encoder_hidden_states)
        if temporal:
            h = MotionModule(heads, ring_mesh=self.ring_mesh,
                             dtype=self.dtype,
                             name="mid_block_motion_modules_0")(
                h, t_frames)
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_1")(h, temb)
        mid_feat = ZeroConv(ch[-1], dtype=self.dtype, name="zero_mid")(h)

        up_feats = []
        rev = tuple(reversed(ch))
        zi = 0
        for i, c in enumerate(rev):
            has_attn = i > 0
            pre = f"up_blocks_{i}"
            for j in range(self.layers_per_block + 1):
                skip = down_res.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResnetBlock2D(c, dtype=self.dtype,
                                  name=f"{pre}_resnets_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(heads, c // heads, dtype=self.dtype,
                                      name=f"{pre}_attentions_{j}")(
                        h, encoder_hidden_states)
                if temporal:
                    h = MotionModule(
                        heads, ring_mesh=self.ring_mesh, dtype=self.dtype,
                        name=f"{pre}_motion_modules_{j}")(h, t_frames)
                up_feats.append(ZeroConv(c, dtype=self.dtype,
                                         name=f"zero_up_{zi}")(h))
                zi += 1
            if i < n_blocks - 1:
                h = Upsample2D(c, dtype=self.dtype,
                               name=f"{pre}_upsamplers_0")(
                    h, down_res[-1].shape[1:3])

        return down_feats, mid_feat, up_feats
