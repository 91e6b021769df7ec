"""Modulated deformable convolution v2 (Zhu et al. 2019) + the
BasicVSR++-style second-order deformable alignment ProPainter uses in
its propagation modules (reference consumes these through the vendored
ProPainter package [external], diffuerase.py:49-57).

TPU-native: CORNER-PACKED gathers — a (H+1, W+1) table whose row (r, s)
holds all 4 bilinear corners of base (r-1, s-1), lane-regrouped so one
offset group's 4*cg lanes are contiguous. Each (group, tap) sample is
then ONE narrow gather instead of four, and the bytes moved per tap
drop from 4 full 128-lane rows to exactly the 4*cg lanes the group
consumes (measured in a lax.scan at the 180x320x128 G=16 propagation
shape on v5e: 128 -> 64 ms/call vs the previous full-width-row
formulation; the 4x-lane pack WITHOUT the narrow slice only reached
120 ms — the win is bytes, not instruction count). Each group's
(tap, cin) -> cout contraction runs immediately on the MXU with f32
accumulation, so the (B, H, W, K, Cin) sample tensor never hits HBM.
torchvision.ops.deform_conv2d layout conventions are kept: offset
channels ordered (group, tap, [dy, dx]), zero padding outside.
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

    Venue (all variants measured in-context on v5e, chained under
    lax.scan, at the 180x320x128 G=16 propagation shape): the
    corner-packed narrow gather (one 4*cg-lane gather per (group, tap))
    runs 64 ms/call vs 128 for the previous four-full-width-row
    formulation and 120 for a corner pack without the narrow lane
    slice — gather cost here is bytes moved, and today's path moves
    exactly the lanes the group consumes. The x-pair (1,2,C)
    slice-gather formulation that wins in isolated microbenchmarks
    LOSES in-context (28.1 ms/call at 60x108, and its vmap-batched
    lax.gather scalarizes to per-sample ops inside the propagation
    while-loop — measured 81% of a 720p window's device time); see
    PROFILE_720p.md history."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    K = kh * kw
    G = mask.shape[3]
    cg = Cin // G
    # corner pack: P[:, r*(W+1)+s, g] = the 4 bilinear corners of base
    # (y0, x0) = (r-1, s-1) for group g's cg lanes, in corner-major
    # order [c00 | c01 | c10 | c11]. The pad ring supplies exact zeros
    # for the +-1 border; anything farther out is masked below.
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    P = jnp.stack([p[:, :-1, :-1], p[:, :-1, 1:],
                   p[:, 1:, :-1], p[:, 1:, 1:]], 3)  # (B, H+1, W+1, 4, C)
    N = (H + 1) * (W + 1)
    P = P.reshape(B, N, 4, G, cg).transpose(0, 1, 3, 2, 4) \
        .reshape(B, N, G, 4 * cg)
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

    def inb(yi, xi):
        return ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))

    for g in range(G):
        y0g, x0g = y0[:, :, :, g, :], x0[:, :, :, g, :]  # (B, H, W, K)
        r = jnp.clip(y0g + 1, 0, H).astype(jnp.int32)
        s = jnp.clip(x0g + 1, 0, W).astype(jnp.int32)
        idx = (r * (W + 1) + s).reshape(B, -1, 1)
        rows = jnp.take_along_axis(P[:, :, g], idx, axis=1)  # (B,HWK,4cg)
        c00 = rows[..., 0 * cg:1 * cg].astype(jnp.float32)
        c01 = rows[..., 1 * cg:2 * cg].astype(jnp.float32)
        c10 = rows[..., 2 * cg:3 * cg].astype(jnp.float32)
        c11 = rows[..., 3 * cg:4 * cg].astype(jnp.float32)
        wyg = wy[:, :, :, g, :].reshape(B, -1, 1)
        wxg = wx[:, :, :, g, :].reshape(B, -1, 1)
        m00 = inb(y0g, x0g).reshape(B, -1, 1)
        m01 = inb(y0g, x0g + 1).reshape(B, -1, 1)
        m10 = inb(y0g + 1, x0g).reshape(B, -1, 1)
        m11 = inb(y0g + 1, x0g + 1).reshape(B, -1, 1)
        v = ((1 - wyg) * (1 - wxg)) * jnp.where(m00, c00, 0.0) \
            + ((1 - wyg) * wxg) * jnp.where(m01, c01, 0.0) \
            + (wyg * (1 - wxg)) * jnp.where(m10, c10, 0.0) \
            + (wyg * wxg) * jnp.where(m11, c11, 0.0)
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
