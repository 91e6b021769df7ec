"""Fused rescale-and-composite.

Reference per-frame postprocess (diffuerase.py:70-112, run on CPU, and with
the frame-0-only early-return bug noted in SURVEY.md §2b#1 — fixed here:
every frame is composited): resize inpainted output back to (H0, W0),
build a feathered alpha from the dilated mask via two distance transforms,
then alpha-blend with the original frame:

  alpha = clip(0.5 + (d_in - d_out) / (2*feather_px), 0, 1)
  out   = clip(rint(alpha*inpainted + (1-alpha)*original), 0, 255)

Here the whole thing is one jitted op batched over the frame axis — a
single HBM round-trip instead of five CPU passes per frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from videovanish_tpu.ops.edt import feather_alpha
from videovanish_tpu.ops.resize import resize_bilinear, resize_nearest_2d


@functools.partial(jax.jit, static_argnames=("feather_px", "keep_unmasked_original"))
def feathered_composite(inpainted: jnp.ndarray, original: jnp.ndarray,
                        mask: jnp.ndarray, feather_px: float = 3.0,
                        keep_unmasked_original: bool = True) -> jnp.ndarray:
    """Composite inpainted frames over originals with a feathered mask edge.

    inpainted: (T, Hi, Wi, 3) uint8/f32 — model output (any resolution)
    original:  (T, H0, W0, 3) uint8     — source frames
    mask:      (T, Hm, Wm) or (T, Hm, Wm, 3) — dilated mask, nonzero=inpaint
    Returns (T, H0, W0, 3) uint8.
    """
    H0, W0 = original.shape[-3], original.shape[-2]

    if inpainted.shape[-3] != H0 or inpainted.shape[-2] != W0:
        inpainted = resize_bilinear(inpainted, H0, W0)
    inpainted = inpainted.astype(jnp.float32)

    if mask.ndim == original.ndim:  # (T,H,W,3) -> any-channel rule
        mask = jnp.any(mask > 0, axis=-1)
    m = mask > 0
    if m.shape[-2] != H0 or m.shape[-1] != W0:
        m = resize_nearest_2d(m.astype(jnp.uint8), H0, W0) > 0

    if not keep_unmasked_original:
        return jnp.clip(jnp.rint(inpainted), 0, 255).astype(jnp.uint8)

    alpha = feather_alpha(m, feather_px)[..., None]
    orig = original.astype(jnp.float32)
    out = alpha * inpainted + (1.0 - alpha) * orig
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
