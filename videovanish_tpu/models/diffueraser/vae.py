"""AutoencoderKL (SD VAE, sd-vae-ft-mse architecture), flax.linen, NHWC.

The reference consumes this through diffusers ("stabilityai/sd-vae-ft-mse",
diffuerase.py:42); internals are the public SD VAE architecture
[external per SURVEY.md §2c]. Encode/decode are per-frame and batch over
the temporal axis, so a whole clip VAE-encodes in one MXU-dense call.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.models.diffueraser.blocks import (
    Attention, GroupNorm, ResnetBlock2D, Downsample2D, Upsample2D,
)


class VAEAttention(nn.Module):
    """Single-head spatial attention used in the VAE mid block."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(32, 1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        h = Attention(num_heads=1, head_dim=C, use_bias=True,
                      dtype=self.dtype, name="attn")(h)
        return x + h.reshape(B, H, W, C)


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        x = VAEAttention(dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class Encoder(nn.Module):
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(ch) - 1:
                h = Downsample2D(c, asymmetric_pad=True, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
        h = MidBlock(ch[-1], dtype=self.dtype, name="mid_block")(h)
        h = GroupNorm(32, 1e-6, name="conv_norm_out")(h, fuse_silu=True)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = self.block_out_channels
        rev = tuple(reversed(ch))  # (512, 512, 256, 128)
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = MidBlock(rev[0], dtype=self.dtype, name="mid_block")(h)
        for i, c in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock2D(c, dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample2D(c, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(h)
        h = GroupNorm(32, 1e-6, name="conv_norm_out")(h, fuse_silu=True)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """SD VAE. encode() returns the mode of the latent distribution (the
    deterministic choice for inference parity); decode() maps latents back
    to [-1, 1] RGB. `scaling_factor` handling is the caller's job
    (model.py) to keep this module a pure weight container."""
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, self.layers_per_block,
                               self.latent_channels, dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels, self.layers_per_block,
                               dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))
