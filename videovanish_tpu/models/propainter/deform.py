"""Modulated deformable convolution v2 (Zhu et al. 2019) + the
BasicVSR++-style second-order deformable alignment ProPainter uses in
its propagation modules (reference consumes these through the vendored
ProPainter package [external], diffuerase.py:49-57).

TPU-native: each of the K kernel taps is one batched bilinear sample
(4 whole-row gathers over the channel lanes, offset groups vectorized
into the batch axis), then ONE einsum contracts (tap, cin) -> cout on
the MXU. torchvision.ops.deform_conv2d layout conventions are kept:
offset channels ordered (group, tap, [dy, dx]), zero padding outside.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.flow import bilinear_sample


def modulated_deform_conv2d(x, offset, mask, kernel, bias, padding: int = 1):
    """x: (B, H, W, Cin); offset: (B, H, W, G, K, 2) as (dy, dx);
    mask: (B, H, W, G, K) in [0, 1]; kernel: flax layout (kh, kw, Cin,
    Cout); returns (B, H, W, Cout). Stride 1, dilation 1 (ProPainter's
    only configuration)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    K = kh * kw
    G = mask.shape[3]
    cg = Cin // G
    xg = x.reshape(B, H, W, G, cg).transpose(0, 3, 1, 2, 4) \
        .reshape(B * G, H, W, cg)
    base_y = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    taps = []
    for k in range(K):
        ky, kx = k // kw - padding, k % kw - padding
        sy = base_y + ky + offset[..., k, 0].astype(jnp.float32)
        sx = base_x + kx + offset[..., k, 1].astype(jnp.float32)
        coords = jnp.stack([sx, sy], -1).transpose(0, 3, 1, 2, 4) \
            .reshape(B * G, H, W, 2)
        s = bilinear_sample(xg, coords)
        m = mask[..., k].transpose(0, 3, 1, 2).reshape(B * G, H, W, 1)
        taps.append(s * m.astype(s.dtype))
    s = jnp.stack(taps, axis=3)  # (B*G, H, W, K, cg)
    s = s.reshape(B, G, H, W, K, cg).transpose(0, 2, 3, 4, 1, 5) \
        .reshape(B, H, W, K, Cin)
    out = jnp.einsum("bhwkc,kco->bhwo", s.astype(jnp.float32),
                     kernel.reshape(K, Cin, Cout).astype(jnp.float32))
    return (out + bias).astype(x.dtype)


def split_offset_mask(raw, groups: int, K: int = 9):
    """BasicVSR++ conv_offset head output (B, H, W, 27*G) ->
    (offset (B,H,W,G,K,2), mask_logits (B,H,W,G,K)).

    torch: o1, o2, mask = chunk(raw, 3, dim=C); offset = cat(o1, o2)
    with torchvision channel layout 2*(g*K + k) + {0:dy, 1:dx}; the o1
    half covers groups [0, G/2), o2 covers [G/2, G)."""
    B, H, W, _ = raw.shape
    o_flat = raw[..., : 2 * groups * K]
    mask_logits = raw[..., 2 * groups * K:]
    offset = o_flat.reshape(B, H, W, groups, K, 2)
    return offset, mask_logits.reshape(B, H, W, groups, K)


class SecondOrderDeformableAlignment(nn.Module):
    """ProPainter's deformable alignment: a conv head predicts per-group
    offsets/masks from conditioning features, then a modulated deform
    conv aligns `x`. When `flow` is given (feature propagation,
    propainter-style), it is added to every predicted offset (torch:
    flow.flip(1) -> (dy, dx), repeated across groups)."""
    out_channels: int
    deform_groups: int = 16
    # E2FGVI/ProPainter-lineage default (BasicVSR++ itself uses 10)
    max_residue_magnitude: float = 3.0
    cond_channels: int = 0  # documentation only; inferred from input
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, flow=None):
        c = self.out_channels
        h = cond
        for i in range(3):
            h = nn.leaky_relu(
                nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_offset_{2 * i}")(h), 0.1)
        raw = nn.Conv(27 * self.deform_groups, (3, 3), padding=1,
                      dtype=self.dtype, name="conv_offset_6")(h)
        raw = raw.astype(jnp.float32)
        G, K = self.deform_groups, 9
        o_flat = raw[..., : 2 * G * K]
        m_logits = raw[..., 2 * G * K:]
        offset = self.max_residue_magnitude * jnp.tanh(o_flat)
        offset = offset.reshape(*offset.shape[:3], G, K, 2)
        if flow is not None:
            # flow is (dx, dy); deform offsets are (dy, dx)
            flo = jnp.stack([flow[..., 1], flow[..., 0]], -1) \
                .astype(jnp.float32)
            offset = offset + flo[:, :, :, None, None, :]
        mask = jax.nn.sigmoid(m_logits.reshape(*m_logits.shape[:3], G, K))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return modulated_deform_conv2d(x, offset, mask, kernel, bias)
