"""Optical-flow ops for the ProPainter-style prior: bilinear warping /
sampling (x-pair slice gathers — the TPU-fast sampling primitive) and
gather-free local correlation (the reference's equivalents live in
torch grid_sample / RAFT corr CUDA paths).

Gather venue notes (measured on v5e, 60x108x128 f32 operand):
  - gather cost scales with SEGMENT count, not bytes: ~330-480M
    single-row segments/s; bf16 rows (256B, sub-granule) run ~1.5x
    SLOWER than f32 rows despite half the bytes — so sample in f32;
  - one lax.gather of (1,2,C) x-adjacent slices (a contiguous 2C-lane
    segment) fetches two bilinear corners in one segment: measured 2x
    over four single-row take_along_axis gathers;
  - (2,2,C) slices are catastrophic (~230x slower) — never span rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _xpair_gather(padded: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray):
    """Gather (1, 2, C) slices at integer (iy, ix) from a zero-padded
    (Hp, Wp, C) image: returns (N, 2, C) = pixels (iy, ix) and
    (iy, ix+1). Indices must already be within [0, Hp-1] x [0, Wp-2]."""
    starts = jnp.stack([iy, ix], axis=-1)  # (N, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    return lax.gather(padded, starts, dn,
                      slice_sizes=(1, 2, padded.shape[-1]),
                      mode=lax.GatherScatterMode.CLIP)


def bilinear_gather(img: jnp.ndarray, sy: jnp.ndarray,
                    sx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample img at float coords, zero padding outside.

    img: (B, H, W, C); sy/sx: (B, N) sample rows/cols (pixel units).
    Returns (B, N, C) in float32. Out-of-bounds corners contribute 0 via
    a zero border on the operand (no per-corner masks needed): that is
    exactly torch grid_sample(padding_mode='zeros') on an align_corners
    pixel grid.
    """
    B, H, W, C = img.shape
    f = img.astype(jnp.float32)  # sub-granule bf16 rows gather slower
    # border: 1 zero row/col before, 2 after — every clipped corner pair
    # (iy in [0, H], ix in [0, W]) lands fully inside, OOB taps read 0
    padded = jnp.pad(f, ((0, 0), (1, 2), (1, 2), (0, 0)))
    # clamp far-OOB samples to the border FIRST: at sy=-1 / sy=H the
    # fractional weight is exactly 0 / lands on the zero border, so the
    # clamp preserves zero-padding semantics while keeping every corner
    # inside the padded operand (a clamp after floor would let e.g.
    # sy=-4.5 read real row 0 with weight .5)
    sy = jnp.clip(sy.astype(jnp.float32), -1.0, jnp.float32(H))
    sx = jnp.clip(sx.astype(jnp.float32), -1.0, jnp.float32(W))
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    iy = y0.astype(jnp.int32) + 1  # into padded coords
    ix = x0.astype(jnp.int32) + 1

    def per_batch(pb, iyb, ixb):
        top = _xpair_gather(pb, iyb, ixb)        # (N, 2, C): (y0, x0/x0+1)
        bot = _xpair_gather(pb, iyb + 1, ixb)    # (N, 2, C): (y0+1, ...)
        return top, bot

    top, bot = jax.vmap(per_batch)(padded, iy, ix)
    row0 = (1.0 - wx) * top[..., 0, :] + wx * top[..., 1, :]
    row1 = (1.0 - wx) * bot[..., 0, :] + wx * bot[..., 1, :]
    return (1.0 - wy) * row0 + wy * row1


@jax.jit
def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow with bilinear sampling, zero padding.

    img:  (B, H, W, C)
    flow: (B, H, W, 2) — (dx, dy) displacement in pixels; output(x) = img(x + flow)
    """
    B, H, W, C = img.shape
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    sx = (gx + flow[..., 0].astype(jnp.float32)).reshape(B, -1)
    sy = (gy + flow[..., 1].astype(jnp.float32)).reshape(B, -1)
    out = bilinear_gather(img, sy, sx)
    return out.reshape(B, H, W, C).astype(img.dtype)


@jax.jit
def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img at absolute (x, y) coords, zero padding.

    img:    (B, H, W, C)
    coords: (B, Ho, Wo, 2) — absolute pixel positions (x, y) in img space;
            the output grid (Ho, Wo) is independent of (H, W).
    Returns (B, Ho, Wo, C).
    """
    B = img.shape[0]
    C = img.shape[-1]
    sx = coords[..., 0].reshape(B, -1)
    sy = coords[..., 1].reshape(B, -1)
    out = bilinear_gather(img, sy, sx)
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


@functools.partial(jax.jit, static_argnames=("mode",))
def flow_warp_mode(img: jnp.ndarray, flow: jnp.ndarray,
                   mode: str = "bilinear") -> jnp.ndarray:
    """Backward-warp with selectable interpolation, matching torch
    grid_sample(mode, padding_mode='zeros', align_corners=True) on a
    pixel grid + flow (the ProPainter flow_warp semantics).

    img: (B, H, W, C); flow: (B, H, W, 2) (dx, dy)."""
    if mode == "bilinear":
        return flow_warp(img, flow)
    B, H, W, C = img.shape
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    # grid_sample 'nearest' rounds half-to-even (std::nearbyint), which
    # jnp.round also does
    sx = jnp.round(gx + flow[..., 0].astype(jnp.float32))
    sy = jnp.round(gy + flow[..., 1].astype(jnp.float32))
    inb = (sy >= 0) & (sy < H) & (sx >= 0) & (sx < W)
    yi = jnp.clip(sy, 0, H - 1).astype(jnp.int32)
    xi = jnp.clip(sx, 0, W - 1).astype(jnp.int32)
    # f32 rows: sub-granule bf16 rows gather ~1.5x slower (module docstring)
    flat = img.astype(jnp.float32).reshape(B, H * W, C)
    vals = jnp.take_along_axis(flat, (yi * W + xi).reshape(B, -1, 1), axis=1)
    vals = vals.reshape(B, H, W, C)
    return jnp.where(inb[..., None], vals, 0).astype(img.dtype)
