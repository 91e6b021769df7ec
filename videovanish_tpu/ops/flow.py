"""Optical-flow ops for the ProPainter-style prior: bilinear warping /
sampling (whole-row gathers — the TPU-fast sampling primitive) and
gather-free local correlation (the reference's equivalents live in
torch grid_sample / RAFT corr CUDA paths).
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


@functools.partial(jax.jit, static_argnames=("feat_mode",))
def fused_prop_warp(feat: jnp.ndarray, mask: jnp.ndarray,
                    chk: jnp.ndarray, flow: jnp.ndarray,
                    feat_mode: str = "nearest"):
    """The image-propagation step's three backward-warps as ONE
    corner-packed gather (the deform.py trick applied to the scan body):

      feat (B,H,W,C)  warped by `flow` with `feat_mode` interpolation,
      mask (B,H,W,1)  warped bilinear,
      chk  (B,H,W,2)  warped bilinear (the fb-consistency operand),

    all sampling at the same coords. Separately these are 9 narrow
    gathers per scan step (4x 1-lane mask taps + 4x 2-lane flow taps +
    1-3 feat taps) — gather cost on TPU is per-row overhead, so packing
    every tap of every operand into one (H+1, W+1, 4*(C+3))-lane corner
    table turns them into a single whole-row gather. Bitwise-equal to
    flow_warp / flow_warp_mode composition (same weight products, same
    accumulate order, same clip+in-bounds masking; verified in
    tests/test_propainter.py::TestFusedPropWarp).

    Assumes FINITE inputs: nearest mode is a weighted sum with exact 0/1
    corner weights, so an inf/NaN in a zero-weighted corner would yield
    0*inf=NaN where the unfused gather would not. Propagation's operands
    are bounded image/mask/flow content, so this holds by construction.

    Returns (feat_warp, mask_warp, chk_warp), dtypes preserved.
    """
    B, H, W, C = feat.shape
    f32 = jnp.float32
    src = jnp.concatenate(
        [mask.astype(f32), chk.astype(f32), feat.astype(f32)], -1)
    Ct = C + 3
    p = jnp.pad(src, ((0, 0), (1, 1), (1, 1), (0, 0)))
    P = jnp.stack([p[:, :-1, :-1], p[:, :-1, 1:],
                   p[:, 1:, :-1], p[:, 1:, 1:]], 3)  # (B,H+1,W+1,4,Ct)
    P = P.reshape(B, (H + 1) * (W + 1), 4 * Ct)

    gy = jnp.arange(H, dtype=f32)[None, :, None]
    gx = jnp.arange(W, dtype=f32)[None, None, :]
    sx = gx + flow[..., 0].astype(f32)
    sy = gy + flow[..., 1].astype(f32)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    r = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    s = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    idx = (r * (W + 1) + s).reshape(B, -1, 1)
    rows = jnp.take_along_axis(P, idx, axis=1)       # (B, HW, 4*Ct)

    def inb(yi, xi):
        return ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)) \
            .reshape(B, H * W, 1)

    m00, m01 = inb(y0, x0), inb(y0, x0 + 1)
    m10, m11 = inb(y0 + 1, x0), inb(y0 + 1, x0 + 1)
    c = [jnp.where(m, rows[..., i * Ct:(i + 1) * Ct], 0.0)
         for i, m in enumerate((m00, m01, m10, m11))]

    def combine(wyc, wxc):
        w00 = ((1 - wyc) * (1 - wxc)).reshape(B, -1, 1)
        w01 = ((1 - wyc) * wxc).reshape(B, -1, 1)
        w10 = (wyc * (1 - wxc)).reshape(B, -1, 1)
        w11 = (wyc * wxc).reshape(B, -1, 1)
        return w00 * c[0] + w01 * c[1] + w10 * c[2] + w11 * c[3]

    bl = combine(wy, wx).reshape(B, H, W, Ct)
    mask_warp = bl[..., 0:1].astype(mask.dtype)
    chk_warp = bl[..., 1:3].astype(chk.dtype)
    if feat_mode == "bilinear":
        feat_warp = bl[..., 3:].astype(feat.dtype)
    else:  # nearest: 0/1 corner-select weights; round matches jnp.round
        # (half-to-even) of the unfused path, and the selected corner's
        # in-bounds mask is exactly inb(round(sy), round(sx))
        wyn = jnp.round(sy) - y0
        wxn = jnp.round(sx) - x0
        feat_warp = combine(wyn, wxn).reshape(B, H, W, Ct)[..., 3:] \
            .astype(feat.dtype)
    return feat_warp, mask_warp, chk_warp


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
    flat = img.reshape(B, H * W, C)
    vals = jnp.take_along_axis(flat, (yi * W + xi).reshape(B, -1, 1), axis=1)
    vals = vals.reshape(B, H, W, C)
    return jnp.where(inb[..., None], vals, 0).astype(img.dtype)
