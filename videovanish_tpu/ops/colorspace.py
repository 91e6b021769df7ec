"""YUV 4:2:0 wire format for the host->device frame upload.

The serial host link (~15-50 MB/s, transfers do NOT overlap device
compute on this transport) makes upload bytes a first-order cost of the
720p pipeline: RGB uint8 at inference resolution is h*w*3 bytes/frame.
I420 planar YUV carries the same frame in h*w*1.5 bytes — 2x fewer —
at the cost of 2x2 chroma subsampling, which is imperceptible for the
diffusion model's INPUT (and the final composite takes unmasked pixels
from the host-resident RGB originals bit-exactly, so output fidelity
outside the inpainted hole is unaffected; see pipeline/infill.py).

Host side uses cv2's SIMD RGB->I420 (video-range BT.601: Y in [16,235],
U/V centered at 128); the device kernel applies the exact BT.601
inverse. Round-trip error vs the RGB path is bounded by chroma
subsampling + uint8 quantization (gated in tests/test_ops_image.py).

The reference has no analogue: it feeds full-res torch tensors over
PCIe (diffuerase.py:59-67), where transfer is effectively free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_yuv420_host(frames: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) RGB uint8 -> (N, H*3//2, W) I420 uint8 (cv2 SIMD;
    numpy fallback with the same video-range BT.601 math)."""
    N, H, W = frames.shape[:3]
    assert H % 2 == 0 and W % 2 == 0, "I420 needs even dimensions"
    try:
        import cv2
        return np.stack([
            cv2.cvtColor(frames[i], cv2.COLOR_RGB2YUV_I420)
            for i in range(N)])
    except ImportError:  # pragma: no cover - cv2 ships with the image
        f = frames.astype(np.float32)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.257 * r + 0.504 * g + 0.098 * b + 16.0
        u = -0.148 * r - 0.291 * g + 0.439 * b + 128.0
        v = 0.439 * r - 0.368 * g - 0.071 * b + 128.0
        u = u.reshape(N, H // 2, 2, W // 2, 2).mean((2, 4))
        v = v.reshape(N, H // 2, 2, W // 2, 2).mean((2, 4))
        out = np.empty((N, H * 3 // 2, W), np.uint8)
        out[:, :H] = np.clip(np.rint(y), 0, 255)
        out[:, H:H + H // 4] = np.clip(np.rint(u), 0, 255) \
            .reshape(N, H // 4, W)
        out[:, H + H // 4:] = np.clip(np.rint(v), 0, 255) \
            .reshape(N, H // 4, W)
        return out


@jax.jit
def yuv420_to_rgb01(yuv_u8: jax.Array) -> jax.Array:
    """(N, h*3//2, w) I420 uint8 -> (N, h, w, 3) f32 RGB in [0,1].

    Video-range BT.601 inverse (matches cv2.COLOR_YUV2RGB_I420 to
    rounding); chroma upsampled nearest — the VAE's own 8x spatial
    downsampling swamps the interpolation choice.
    """
    n, rows, w = yuv_u8.shape
    h = rows * 2 // 3
    y = yuv_u8[:, :h, :].astype(jnp.float32)
    u = yuv_u8[:, h:h + h // 4, :].reshape(n, h // 2, w // 2) \
        .astype(jnp.float32) - 128.0
    v = yuv_u8[:, h + h // 4:, :].reshape(n, h // 2, w // 2) \
        .astype(jnp.float32) - 128.0
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    yf = (y - 16.0) * 1.16438
    r = yf + 1.59603 * v
    g = yf - 0.39176 * u - 0.81297 * v
    b = yf + 2.01723 * u
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0) / 255.0
