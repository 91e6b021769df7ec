"""Optical-flow ops for the ProPainter-style prior: bilinear warping and
all-pairs correlation, expressed as XLA-friendly gathers/matmuls (the
reference's equivalents live in torch grid_sample / RAFT corr CUDA paths).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow with bilinear sampling, zero padding.

    img:  (B, H, W, C)
    flow: (B, H, W, 2) — (dx, dy) displacement in pixels; output(x) = img(x + flow)
    """
    B, H, W, C = img.shape
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    sx = gx + flow[..., 0].astype(jnp.float32)
    sy = gy + flow[..., 1].astype(jnp.float32)

    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = sx - x0; wy = sy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = img.reshape(B, H * W, C)
        idx = yi * W + xi  # (B, H, W)
        vals = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1)
        vals = vals.reshape(B, H, W, C)
        return jnp.where(inb[..., None], vals, 0.0)

    out = ((1 - wy) * (1 - wx))[..., None] * gather(y0, x0) \
        + ((1 - wy) * wx)[..., None] * gather(y0, x0 + 1) \
        + (wy * (1 - wx))[..., None] * gather(y0 + 1, x0) \
        + (wy * wx)[..., None] * gather(y0 + 1, x0 + 1)
    return out.astype(img.dtype)


@jax.jit
def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img at absolute (x, y) coords, zero padding.

    img:    (B, H, W, C)
    coords: (B, Ho, Wo, 2) — absolute pixel positions (x, y) in img space;
            the output grid (Ho, Wo) is independent of (H, W).
    Returns (B, Ho, Wo, C). The 4 taps are whole-row gathers (C on lanes)
    — the TPU-friendly sampling primitive (scalar gathers are ~100x
    slower on TPU).
    """
    B, H, W, C = img.shape
    sx = coords[..., 0].astype(jnp.float32)
    sy = coords[..., 1].astype(jnp.float32)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = sx - x0; wy = sy - y0

    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = (yi * W + xi).reshape(B, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return jnp.where(inb.reshape(B, -1, 1), vals, 0.0)

    out = ((1 - wy) * (1 - wx)).reshape(B, -1, 1) * gather(y0, x0) \
        + ((1 - wy) * wx).reshape(B, -1, 1) * gather(y0, x0 + 1) \
        + (wy * (1 - wx)).reshape(B, -1, 1) * gather(y0 + 1, x0) \
        + (wy * wx).reshape(B, -1, 1) * gather(y0 + 1, x0 + 1)
    return out.reshape(B, coords.shape[1], coords.shape[2], C) \
        .astype(img.dtype)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (B, H, W, C) by (dy, dx) tokens with zero padding:
    out[i, j] = x[i + dy, j + dx]. Shifts past the grid are all-zero."""
    B, H, W, C = x.shape
    if abs(dy) >= H or abs(dx) >= W:
        return jnp.zeros_like(x)
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    return jnp.pad(x[:, ys, xs], ((0, 0), pad_y, pad_x, (0, 0)))


@functools.partial(jax.jit, static_argnames=("radius", "stride"))
def local_corr(f1: jnp.ndarray, f2w: jnp.ndarray, radius: int = 4,
               stride: int = 1) -> jnp.ndarray:
    """Local correlation of f1 with token-shifted copies of f2w.

    corr[b, i, (dy, dx)] = <f1[b, i], f2w[b, i + (dy, dx) * stride]> / sqrt(D)
    for dy, dx in [-radius, radius]. All (2r+1)^2 shifts are STATIC
    slices + one VPU multiply-reduce each — no gathers; this is how the
    RAFT correlation lookup stays off the TPU's slow scalar-gather path.
    Returns (B, H, W, (2r+1)^2).
    """
    D = f1.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    f1f = f1.astype(jnp.float32)
    outs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            sh = _shift2d(f2w, dy * stride, dx * stride).astype(jnp.float32)
            outs.append(jnp.sum(f1f * sh, axis=-1))
    return (jnp.stack(outs, axis=-1) * scale).astype(f1.dtype)


@functools.partial(jax.jit, static_argnames=("num_levels", "radius"))
def correlation_pyramid(f1: jnp.ndarray, f2: jnp.ndarray,
                        num_levels: int = 4, radius: int = 4):
    """RAFT all-pairs correlation volume + average-pooled pyramid.

    f1, f2: (B, H, W, D). Returns list of (B, H, W, H/2^l, W/2^l) volumes.
    The big (HW x HW) matmul maps straight onto the MXU.
    """
    B, H, W, D = f1.shape
    a = f1.reshape(B, H * W, D).astype(jnp.float32)
    b = f2.reshape(B, H * W, D).astype(jnp.float32)
    corr = jnp.einsum("bnd,bmd->bnm", a, b,
                      preferred_element_type=jnp.float32) / jnp.sqrt(D * 1.0)
    corr = corr.reshape(B, H, W, H, W)
    pyr = [corr]
    cur = corr
    for _ in range(num_levels - 1):
        Bc, Hc, Wc, h2, w2 = cur.shape
        ph, pw = h2 % 2, w2 % 2
        if ph or pw:  # odd level dims: edge-pad so 2x2 pooling stays exact
            cur = jnp.pad(cur, ((0, 0), (0, 0), (0, 0), (0, ph), (0, pw)),
                          mode="edge")
            h2, w2 = h2 + ph, w2 + pw
        cur = cur.reshape(Bc, Hc, Wc, h2 // 2, 2, w2 // 2, 2).mean(axis=(4, 6))
        pyr.append(cur)
    return pyr


@functools.partial(jax.jit, static_argnames=("radius",))
def lookup_corr(corr_level: jnp.ndarray, coords: jnp.ndarray, radius: int = 4):
    """Sample a correlation level in a (2r+1)^2 window around coords.

    corr_level: (B, H, W, h, w); coords: (B, H, W, 2) at level resolution.
    Returns (B, H, W, (2r+1)^2).
    """
    B, H, W, h, w = corr_level.shape
    r = radius
    vol = corr_level.reshape(B * H * W, h, w, 1)
    cg = coords.reshape(B * H * W, 1, 1, 2)
    dys = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dxs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(dys, dxs, indexing="ij")
    offs = jnp.stack([dx, dy], axis=-1).reshape(1, 2 * r + 1, 2 * r + 1, 2)
    sample_xy = cg + offs  # (BHW, 2r+1, 2r+1, 2)

    # bilinear sample vol at sample_xy (treat batch of BHW tiny images)
    sx, sy = sample_xy[..., 0], sample_xy[..., 1]
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    wx = sx - x0; wy = sy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = vol.reshape(B * H * W, h * w)
        idx = (yi * w + xi).reshape(B * H * W, -1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return jnp.where(inb.reshape(B * H * W, -1), vals, 0.0)

    n = (2 * r + 1) ** 2
    out = ((1 - wy) * (1 - wx)).reshape(-1, n) * gather(y0, x0) \
        + ((1 - wy) * wx).reshape(-1, n) * gather(y0, x0 + 1) \
        + (wy * (1 - wx)).reshape(-1, n) * gather(y0 + 1, x0) \
        + (wy * wx).reshape(-1, n) * gather(y0 + 1, x0 + 1)
    return out.reshape(B, H, W, n)
