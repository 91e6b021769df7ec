"""On-device resize with OpenCV-matching semantics.

The reference resizes on CPU with cv2 (tools.py:42 nearest; diffuerase.py:73
bilinear; sam2_masker.py:167 nearest). Both are reproduced as jitted gathers
so rescale-and-composite stays on-device:
  - nearest: src = floor(dst * scale) (cv2 INTER_NEAREST)
  - bilinear: half-pixel centers, clamped (cv2 INTER_LINEAR default)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.INTER_NEAREST-compatible resize of (..., H, W, C) (channel-last)."""
    H, W = img.shape[-3], img.shape[-2]
    sy, sx = H / out_h, W / out_w
    ys = jnp.clip(jnp.floor(jnp.arange(out_h) * sy).astype(jnp.int32), 0, H - 1)
    xs = jnp.clip(jnp.floor(jnp.arange(out_w) * sx).astype(jnp.int32), 0, W - 1)
    return img[..., ys[:, None], xs[None, :], :]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest_2d(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.INTER_NEAREST-compatible resize of a channel-less (..., H, W) map."""
    return resize_nearest(img[..., None], out_h, out_w)[..., 0]


def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Cubic-convolution kernel (torch F.interpolate bicubic uses a=-0.75;
    jax.image.resize uses a=-0.5, hence this explicit implementation)."""
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0, ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0,
        jnp.where(at < 2.0, a * (((at - 5.0) * at + 8.0) * at - 4.0), 0.0))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bicubic_torch(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch.nn.functional.interpolate(mode="bicubic",
    align_corners=False)-compatible resize of (..., H, W, C); returns f32.
    Half-pixel centers, 4-tap cubic (a=-0.75), edge-clamped taps. Used for
    the Hiera absolute-position-embedding interpolation, which the
    official SAM2 does bicubically."""
    H, W = img.shape[-3], img.shape[-2]
    x = img.astype(jnp.float32)

    def taps(out_n, N):
        f = (jnp.arange(out_n) + 0.5) * (N / out_n) - 0.5
        base = jnp.floor(f).astype(jnp.int32)
        frac = f - base
        idx = jnp.stack([jnp.clip(base + o, 0, N - 1) for o in (-1, 0, 1, 2)])
        wts = jnp.stack([_cubic_weights(frac + 1.0), _cubic_weights(frac),
                         _cubic_weights(frac - 1.0), _cubic_weights(frac - 2.0)])
        return idx, wts  # (4, out_n) each

    yi, yw = taps(out_h, H)
    xi, xw = taps(out_w, W)
    rows = sum(x[..., yi[i], :, :] * yw[i][:, None, None] for i in range(4))
    out = sum(rows[..., :, xi[i], :] * xw[i][None, :, None] for i in range(4))
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.INTER_LINEAR-compatible resize (half-pixel centers).

    img: (..., H, W, C) float or uint8; returns f32.
    """
    H, W = img.shape[-3], img.shape[-2]
    x = img.astype(jnp.float32)
    fy = (jnp.arange(out_h) + 0.5) * (H / out_h) - 0.5
    fx = (jnp.arange(out_w) + 0.5) * (W / out_w) - 0.5
    y0f = jnp.floor(fy); x0f = jnp.floor(fx)
    wy = (fy - y0f).astype(jnp.float32)
    wx = (fx - x0f).astype(jnp.float32)
    # cv2 border handling: clamp the tap pair and zero the fractional weight
    # when the source coordinate falls outside the image.
    wy = jnp.where(y0f < 0, 0.0, jnp.where(y0f > H - 2, 1.0, wy)) if H > 1 \
        else jnp.zeros_like(wy)
    wx = jnp.where(x0f < 0, 0.0, jnp.where(x0f > W - 2, 1.0, wx)) if W > 1 \
        else jnp.zeros_like(wx)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, max(H - 2, 0))
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, max(W - 2, 0))
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    # gather rows then columns (two separable gathers keep it XLA-friendly)
    top = x[..., y0, :, :] * (1 - wy)[:, None, None] + x[..., y1, :, :] * wy[:, None, None]
    out = (top[..., :, x0, :] * (1 - wx)[None, :, None]
           + top[..., :, x1, :] * wx[None, :, None])
    return out


def resize_long_side(img: jnp.ndarray, max_long_side: int,
                     multiple_of: int = 8):
    """Compute target size capping the long side (DiffuEraser max_img_size
    semantics, diffuerase.py:64) rounded to a multiple (VAE needs /8).
    Returns (out_h, out_w) — pure python, for static shape planning."""
    H, W = img.shape[-3], img.shape[-2]
    return plan_long_side(H, W, max_long_side, multiple_of)


def plan_long_side(H: int, W: int, max_long_side: int, multiple_of: int = 8):
    scale = min(1.0, max_long_side / max(H, W))
    out_h = max(multiple_of, int(round(H * scale / multiple_of)) * multiple_of)
    out_w = max(multiple_of, int(round(W * scale / multiple_of)) * multiple_of)
    return out_h, out_w


# ---------------------------------------------------------------------------
# host-side (numpy/cv2) variants for the staging edge: resizing BEFORE the
# upload keeps bytes off the serial host link; semantics match the jitted
# ops above (cv2 INTER_LINEAR / INTER_NEAREST), uint8 rounding aside.
# ---------------------------------------------------------------------------
def host_resize_bilinear_u8(frames, h: int, w: int):
    """Host INTER_LINEAR resize of (T, H, W, 3) uint8."""
    import numpy as np
    try:
        import cv2
        return np.stack([cv2.resize(f, (w, h),
                                    interpolation=cv2.INTER_LINEAR)
                         for f in frames])
    except ImportError:  # pragma: no cover - cv2 ships with the package
        out = resize_bilinear(jnp.asarray(frames, jnp.float32), h, w)
        import numpy as np
        return np.asarray(jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8))


def host_resize_nearest_2d(masks, h: int, w: int):
    """Host INTER_NEAREST resize of (T, H, W) uint8/bool (cv2 floor
    semantics, matching resize_nearest_2d)."""
    import numpy as np
    H, W = masks.shape[1], masks.shape[2]
    ys = np.minimum(np.floor(np.arange(h) * (H / h)).astype(np.int64), H - 1)
    xs = np.minimum(np.floor(np.arange(w) * (W / w)).astype(np.int64), W - 1)
    return masks[:, ys[:, None], xs[None, :]]


def _align_corners_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with torch
    align_corners=True semantics: src = i * (n_in - 1) / (n_out - 1)."""
    import numpy as np
    if n_in == 1 or n_out == 1:
        m = np.zeros((n_out, n_in), np.float32)
        m[:, 0] = 1.0
        return jnp.asarray(m)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - w
    m[np.arange(n_out), hi] += w
    return jnp.asarray(m)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_align_corners(img: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) /
    nn.Upsample(align_corners=True) on (..., H, W, C). Separable: two
    small dense matmuls (interior sizes are a few hundred), which is
    both exact and MXU-friendly — no gathers."""
    H, W = img.shape[-3], img.shape[-2]
    my = _align_corners_matrix(H, out_h)
    mx = _align_corners_matrix(W, out_w)
    x = jnp.einsum("oh,...hwc->...owc", my, img.astype(jnp.float32))
    x = jnp.einsum("ow,...hwc->...hoc", mx, x)
    return x.astype(img.dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_torch_half_pixel(img: jnp.ndarray, out_h: int,
                                     out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False):
    half-pixel centers with edge clamping, matrix form like above."""
    import numpy as np
    H, W = img.shape[-3], img.shape[-2]

    def mat(n_in, n_out):
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0, n_in - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        w = (src - lo).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), lo] += 1.0 - w
        m[np.arange(n_out), hi] += w
        return jnp.asarray(m)

    x = jnp.einsum("oh,...hwc->...owc", mat(H, out_h),
                   img.astype(jnp.float32))
    x = jnp.einsum("ow,...hwc->...hoc", mat(W, out_w), x)
    return x.astype(img.dtype)
