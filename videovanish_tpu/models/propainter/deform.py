"""Modulated deformable convolution v2 (Zhu et al. 2019) + the
BasicVSR++-style second-order deformable alignment ProPainter uses in
its propagation modules (reference consumes these through the vendored
ProPainter package [external], diffuerase.py:49-57).

TPU-native: all K taps of one offset group are gathered together as
FULL-WIDTH rows (C on lanes) and the group's cg lanes sliced afterwards
— narrow-lane gathers are the slow path on TPU (measured 2.5x: 24.7 ms
-> 9.8 ms per 60x108x128 alignment on v5e), because the gather unit
moves whole 128-lane rows either way. Then ONE einsum contracts
(tap, cin) -> cout on the MXU. torchvision.ops.deform_conv2d layout
conventions are kept: offset channels ordered (group, tap, [dy, dx]),
zero padding outside.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def modulated_deform_conv2d(x, offset, mask, kernel, bias, padding: int = 1):
    """x: (B, H, W, Cin); offset: (B, H, W, G, K, 2) as (dy, dx);
    mask: (B, H, W, G, K) in [0, 1]; kernel: flax layout (kh, kw, Cin,
    Cout); returns (B, H, W, Cout). Stride 1, dilation 1 (ProPainter's
    only configuration).

    Venue: all K taps of a group sample through ops/flow.bilinear_gather
    (f32 x-pair slice gathers — see its docstring for the measured TPU
    gather rules), and each group's (tap, cin) -> cout contraction runs
    on the MXU immediately (f32 accumulate), so the (B, H, W, K, Cin)
    sample tensor is never materialized in HBM."""
    from videovanish_tpu.ops.flow import bilinear_gather

    B, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    K = kh * kw
    G = mask.shape[3]
    cg = Cin // G
    ks = jnp.arange(K)
    ky = (ks // kw - padding).astype(jnp.float32)
    kx = (ks % kw - padding).astype(jnp.float32)
    # absolute sample coords per (b, h, w, g, k)
    sy = jnp.arange(H, dtype=jnp.float32)[None, :, None, None, None] \
        + ky[None, None, None, None, :] + offset[..., 0].astype(jnp.float32)
    sx = jnp.arange(W, dtype=jnp.float32)[None, None, :, None, None] \
        + kx[None, None, None, None, :] + offset[..., 1].astype(jnp.float32)
    kmat = kernel.reshape(K, Cin, Cout).astype(jnp.float32)
    out = jnp.zeros((B, H * W, Cout), jnp.float32)
    for g in range(G):
        syg = sy[:, :, :, g, :].reshape(B, -1)  # (B, H*W*K)
        sxg = sx[:, :, :, g, :].reshape(B, -1)
        v = bilinear_gather(x, syg, sxg)        # (B, H*W*K, Cin) f32
        v = v.reshape(B, H * W, K, Cin)[..., g * cg:(g + 1) * cg]
        v = v * mask[:, :, :, g, :].reshape(B, H * W, K, 1) \
            .astype(jnp.float32)
        out = out + jnp.einsum("bpkc,kco->bpo", v,
                               kmat[:, g * cg:(g + 1) * cg])
    out = out.reshape(B, H, W, Cout)
    return (out + bias).astype(x.dtype)


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
