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
