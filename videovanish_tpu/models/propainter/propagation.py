"""Flow-guided image-domain propagation (ProPainter's non-learnable
BidirectionalPropagation [external] — reference consumes it through the
vendored package, diffuerase.py:49-57).

Published semantics, exactly: backward pass (future -> past) then a
forward pass consuming the backward pass's outputs; a pixel fills only
where the current frame has a hole, the forward/backward flows pass the
consistency check, and the source pixel is itself valid. Frames warp
with nearest interpolation, masks with bilinear; every decision mask is
re-binarized at 0.1 (the published `binary_mask`).

TPU-first: each direction is one lax.scan over frames (the recurrence
is inherent); warps are batched whole-row gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from videovanish_tpu.ops.flow import flow_warp, flow_warp_mode, \
    fused_prop_warp


def binary_mask(m, th: float = 0.1):
    return (m > th).astype(jnp.float32)


def fb_consistency_check(flow_fw, flow_bw, alpha1=0.01, alpha2=0.5):
    """1 where the backward flow warped by the forward flow cancels it."""
    flow_bw_warped = flow_warp_mode(flow_bw, flow_fw, "bilinear")
    flow_diff = flow_fw + flow_bw_warped
    norm = (flow_fw ** 2).sum(-1, keepdims=True) \
        + (flow_bw_warped ** 2).sum(-1, keepdims=True)
    thresh = alpha1 * norm + alpha2
    return ((flow_diff ** 2).sum(-1, keepdims=True) < thresh) \
        .astype(jnp.float32)


def _one_direction(feats, masks, flows_prop, flows_check,
                   interpolation: str):
    """feats (T,H,W,C), masks (T,H,W,1) holes, flows_* (T-1,H,W,2)
    already ordered so step i>0 uses flows[i-1]."""
    T, H, W, C = feats.shape
    zero_fl = jnp.zeros((1, H, W, 2), jnp.float32)
    fl_p = jnp.concatenate([zero_fl, flows_prop], 0)
    fl_c = jnp.concatenate([zero_fl, flows_check], 0)

    def step(carry, xs):
        feat_prop, mask_prop, i = carry
        feat_cur, mask_cur, f_p, f_c = xs
        # the step's three warps (feat by `interpolation`, mask bilinear,
        # and the consistency check's flow_bw bilinear) sample at the
        # same coords — one corner-packed gather instead of 9 narrow
        # ones (ops/flow.fused_prop_warp, bitwise-equal composition)
        feat_warp, mask_warp_raw, chk_warp = fused_prop_warp(
            feat_prop[None], mask_prop[None], f_c[None], f_p[None],
            interpolation)
        flow_diff = f_p[None] + chk_warp
        norm = (f_p[None] ** 2).sum(-1, keepdims=True) \
            + (chk_warp ** 2).sum(-1, keepdims=True)
        valid = ((flow_diff ** 2).sum(-1, keepdims=True)
                 < 0.01 * norm + 0.5).astype(jnp.float32)[0]
        feat_warp = feat_warp[0]
        mask_warp = binary_mask(mask_warp_raw[0])
        union = binary_mask(mask_cur * valid * (1.0 - mask_warp))
        f = union * feat_warp + (1.0 - union) * feat_cur
        m = binary_mask(mask_cur * (1.0 - valid * (1.0 - mask_warp)))
        f = jnp.where(i > 0, f, feat_cur)
        m = jnp.where(i > 0, m, mask_cur)
        return (f, m, i + 1), (f, m)

    init = (jnp.zeros((H, W, C), feats.dtype),
            jnp.zeros((H, W, 1), jnp.float32), jnp.int32(0))
    _, (out_f, out_m) = jax.lax.scan(step, init, (feats, masks, fl_p, fl_c))
    return out_f, out_m


def image_propagation(frames, masks, flows_f, flows_b,
                      interpolation: str = "nearest"):
    """frames: (T, H, W, C) masked content; masks: (T, H, W, 1) holes
    (1 = hole); flows_f: (T-1, H, W, 2) flow t -> t+1; flows_b:
    (T-1, H, W, 2) flow t+1 -> t. Returns (propagated, updated_masks)."""
    masks = masks.astype(jnp.float32)
    # backward pass on the reversed sequence warps with FORWARD flows
    b_f, b_m = _one_direction(frames[::-1], masks[::-1],
                              flows_f[::-1], flows_b[::-1], interpolation)
    b_f, b_m = b_f[::-1], b_m[::-1]
    # forward pass consumes the backward pass's outputs
    f_f, f_m = _one_direction(b_f, b_m, flows_b, flows_f, interpolation)
    return f_f, f_m
