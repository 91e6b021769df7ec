"""SD1.5-family conditional UNet with temporal attention and BrushNet
residual injection, flax.linen, NHWC.

Public SD1.5 UNet2DConditionModel topology (reference consumes it via
diffusers, diffuerase.py:39-45; internals [external] per SURVEY.md §2c):
conv_in -> 3x CrossAttnDown + Down -> mid -> Up + 3x CrossAttnUp ->
conv_out, 1280-d time embedding, 768-d CLIP cross-attention. This
implementation adds (a) an AnimateDiff-style MotionModule after every
resnet(+attention) in ALL down/up blocks and the mid block when
`t_frames > 1` — the diffusers UNetMotionModel placement, matching the
published `unet_main` checkpoint 1:1 (21 motion modules for SD1.5) —
and (b) additive BrushNet features at each skip/mid/up stage
(BrushNet-style dual-branch per-layer injection).

Tensor-parallel sharding rules for these params live in
parallel/sharding.py (heads over "model"); frames ride the batch axis
("data").
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from videovanish_tpu.models.diffueraser.blocks import (
    GroupNorm, ResnetBlock2D, Transformer2D, Downsample2D, Upsample2D,
    TimestepEmbedding, timestep_embedding,
)
from videovanish_tpu.models.diffueraser.temporal import MotionModule


class UNetCondition(nn.Module):
    """SD1.5 UNet. sample: (B*T, h, w, C_in); returns epsilon prediction.

    brushnet_* are optional additive features from BrushNetModel:
      brushnet_down: list matching the 13 down residuals (incl conv_in)
      brushnet_mid:  (B*T, h/8, w/8, C3)
      brushnet_up:   list matching each up-block resnet output (12)
    """
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    use_temporal: bool = True
    ring_mesh: object = None  # mesh for sequence-parallel temporal attention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 t_frames: int = 1,
                 brushnet_down: Optional[list] = None,
                 brushnet_mid: Optional[jnp.ndarray] = None,
                 brushnet_up: Optional[list] = None):
        ch = tuple(self.block_out_channels)
        n_blocks = len(ch)
        heads = self.num_attention_heads
        temporal = self.use_temporal and t_frames > 1

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(t_emb.astype(self.dtype))

        def maybe_add(x, res):
            return x if res is None else x + res.astype(x.dtype)

        bd = list(brushnet_down) if brushnet_down is not None else None
        bu = list(brushnet_up) if brushnet_up is not None else None

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        h = maybe_add(h, bd.pop(0) if bd else None)
        down_res = [h]

        # ---- down blocks: CrossAttn x (n-1) then plain DownBlock ----
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
                # UNetMotionModel places a motion module after EVERY
                # resnet — including the attention-free DownBlockMotion
                if temporal:
                    h = MotionModule(
                        heads, ring_mesh=self.ring_mesh, dtype=self.dtype,
                        name=f"{pre}_motion_modules_{j}")(h, t_frames)
                h = maybe_add(h, bd.pop(0) if bd else None)
                down_res.append(h)
            if i < n_blocks - 1:
                h = Downsample2D(c, dtype=self.dtype,
                                 name=f"{pre}_downsamplers_0")(h)
                h = maybe_add(h, bd.pop(0) if bd else None)
                down_res.append(h)

        # ---- mid ----
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(heads, ch[-1] // heads, dtype=self.dtype,
                          name="mid_block_attentions_0")(h, encoder_hidden_states)
        if temporal:
            h = MotionModule(heads, ring_mesh=self.ring_mesh,
                             dtype=self.dtype,
                             name="mid_block_motion_modules_0")(
                h, t_frames)
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_block_resnets_1")(h, temb)
        h = maybe_add(h, brushnet_mid)

        # ---- up blocks: plain UpBlock then CrossAttn x (n-1) ----
        rev = tuple(reversed(ch))  # e.g. (1280, 1280, 640, 320)
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
                if temporal:  # every resnet, incl. plain UpBlockMotion
                    h = MotionModule(
                        heads, ring_mesh=self.ring_mesh, dtype=self.dtype,
                        name=f"{pre}_motion_modules_{j}")(h, t_frames)
                h = maybe_add(h, bu.pop(0) if bu else None)
            if i < n_blocks - 1:
                # target the next skip's exact (odd-safe) resolution
                h = Upsample2D(c, dtype=self.dtype,
                               name=f"{pre}_upsamplers_0")(
                    h, down_res[-1].shape[1:3])

        h = GroupNorm(32, 1e-5, name="conv_norm_out")(h, fuse_silu=True)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)
