"""Modulated deformable convolution v2 (Zhu et al. 2019) + the
BasicVSR++-style second-order deformable alignment ProPainter uses in
its propagation modules (reference consumes these through the vendored
ProPainter package [external], diffuerase.py:49-57).

TPU-native: all K taps of one offset group are gathered together as
FULL-WIDTH rows (C on lanes) and the group's cg lanes sliced afterwards
— narrow-lane gathers are the slow path on TPU (measured 2.5x: 24.7 ms
-> 9.8 ms per 60x108x128 alignment on v5e), because the gather unit
moves whole 128-lane rows either way. Each group's (tap, cin) -> cout
contraction then runs immediately on the MXU (fused per group: the
(B, H, W, K, Cin) sample tensor never materializes in HBM; measured
11.1 vs 13.9 ms/call). torchvision.ops.deform_conv2d layout conventions
are kept: offset channels ordered (group, tap, [dy, dx]), zero padding
outside.
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

    Venue (all variants measured in-context on v5e at the alignment
    shape 60x108x128, G=16, chained under lax.scan): taps gather as
    full-width rows via take_along_axis in the INPUT dtype (bf16 rows
    11.1 ms/call vs 13.9 f32 — and x is bf16 on TPU anyway, so no extra
    rounding), and each group's (tap, cin) -> cout contraction runs on
    the MXU immediately with f32 accumulation, so the (B, H, W, K, Cin)
    sample tensor never hits HBM. The x-pair (1,2,C) slice-gather
    formulation that wins in isolated microbenchmarks LOSES here (28.1
    ms/call, and its vmap-batched lax.gather scalarizes to per-sample
    ops inside the propagation while-loop — measured 81% of a 720p
    window's device time); see PROFILE_720p.md history."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    K = kh * kw
    G = mask.shape[3]
    cg = Cin // G
    flat = x.reshape(B, H * W, Cin)
    ks = jnp.arange(K)
    ky = (ks // kw - padding).astype(jnp.float32)
    kx = (ks % kw - padding).astype(jnp.float32)
    # absolute sample coords per (b, h, w, g, k)
    sy = jnp.arange(H, dtype=jnp.float32)[None, :, None, None, None] \
        + ky[None, None, None, None, :] + offset[..., 0].astype(jnp.float32)
    sx = jnp.arange(W, dtype=jnp.float32)[None, None, :, None, None] \
        + kx[None, None, None, None, :] + offset[..., 1].astype(jnp.float32)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    kmat = kernel.reshape(K, Cin, Cout).astype(jnp.float32)
    out = jnp.zeros((B, H * W, Cout), jnp.float32)
    for g in range(G):
        y0g, x0g = y0[:, :, :, g, :], x0[:, :, :, g, :]  # (B, H, W, K)
        wyg = wy[:, :, :, g, :].reshape(B, -1, 1)
        wxg = wx[:, :, :, g, :].reshape(B, -1, 1)

        def gather(yi, xi):
            inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            idx = (yi * W + xi).reshape(B, -1, 1)
            vals = jnp.take_along_axis(flat, idx, axis=1)
            vals = vals[..., g * cg:(g + 1) * cg].astype(jnp.float32)
            return jnp.where(inb.reshape(B, -1, 1), vals, 0.0)

        v = ((1 - wyg) * (1 - wxg)) * gather(y0g, x0g) \
            + ((1 - wyg) * wxg) * gather(y0g, x0g + 1) \
            + (wyg * (1 - wxg)) * gather(y0g + 1, x0g) \
            + (wyg * wxg) * gather(y0g + 1, x0g + 1)
        v = v.reshape(B, H * W, K, cg) \
            * mask[:, :, :, g, :].reshape(B, H * W, K, 1).astype(jnp.float32)
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
