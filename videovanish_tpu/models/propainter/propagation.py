"""Flow-guided bidirectional propagation ([external] per SURVEY.md §2c:
ProPainter's dual-domain propagation).

Implemented as lax.scan over the frame axis (the recurrence is inherent —
each frame fills from its already-filled neighbor), with all warps as
batched bilinear gathers. Works on any channel count, so the same
function propagates images (C=3) and encoder features (C=channels).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from videovanish_tpu.ops.flow import flow_warp


@functools.partial(jax.jit, static_argnames=())
def propagate_one_direction(content, known, holes, flows):
    """Sequential fill along the scan direction.

    content: (T, H, W, C) — frames/features with holes
    known:   (T, H, W, 1) f32 — 1 where content is valid
    holes:   (T, H, W, 1) f32 — 1 where content must be filled
    flows:   (T-1, H, W, 2) — flow from frame t to frame t-1 in scan order
             (i.e. warp(prev, flows[t-1]) aligns prev into frame t)
    Returns (filled_content, still_known) with holes filled where the
    propagated source was valid.
    """
    def step(carry, inp):
        prev_c, prev_k = carry
        cur_c, cur_k, cur_h, flow = inp
        warped_c = flow_warp(prev_c[None], flow[None])[0]
        warped_k = flow_warp(prev_k[None], flow[None])[0]
        ok = (warped_k > 0.95).astype(cur_c.dtype)
        fill = cur_h * ok
        new_c = cur_c * (1 - fill) + warped_c * fill
        new_k = jnp.maximum(cur_k, fill)
        return (new_c, new_k), (new_c, new_k)

    init = (content[0], known[0])
    (_, _), (out_c, out_k) = jax.lax.scan(
        step, init, (content[1:], known[1:], holes[1:], flows))
    return (jnp.concatenate([content[:1], out_c], axis=0),
            jnp.concatenate([known[:1], out_k], axis=0))


@jax.jit
def bidirectional_propagation(content, masks, flows_fwd, flows_bwd):
    """Fill holes from the past, then from the future.

    content: (T, H, W, C); masks: (T, H, W, 1) 1=hole
    flows_fwd: (T-1, H, W, 2) flow t -> t-1 ("backward flow", aligns t-1
               into t) used for the forward-in-time pass
    flows_bwd: (T-1, H, W, 2) flow t -> t+1 used for the backward pass
    Returns (filled, remaining_hole_mask).
    """
    known = 1.0 - masks
    holes = masks

    f_c, f_k = propagate_one_direction(content, known, holes, flows_fwd)

    # backward pass on the time-reversed sequence
    rb_c, rb_k = propagate_one_direction(
        f_c[::-1], f_k[::-1], (1.0 - f_k)[::-1], flows_bwd[::-1])
    out = rb_c[::-1]
    out_k = rb_k[::-1]
    return out, 1.0 - out_k
