"""Recurrent flow completion (ProPainter's RecurrentFlowCompleteNet,
Zhou et al. 2023 [external] — reference consumes it via the vendored
ProPainter, diffuerase.py:49-57; weights `recurrent_flow_completion.pth`).

Architecture (exact published layout so the checkpoint loads through
core/convert.py FLOWCOMP_RULES):
  P3D encoder over (flow, mask) at 1/2 -> 1/8, dilated 2D mid stack,
  second-order deformable-alignment bidirectional propagation over
  time, 2D decoder with bilinear-align-corners deconvs back to flow.

TPU-first: the only inherently sequential part (the propagation
recurrence) is an nn.scan over frames; everything else runs batched
over all frame pairs in one program. The temporal 3D convs are (3,1,1)
dilation-2 kernels — cheap on the MXU as NDHWC convs.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.models.propainter.deform import (
    SecondOrderDeformableAlignment,
)
from videovanish_tpu.ops.resize import resize_bilinear_align_corners


def lrelu(x, slope=0.2):
    return nn.leaky_relu(x, slope)


class P3DBlock(nn.Module):
    """(1,k,k) spatial conv + (3,1,1) dilation-2 temporal conv."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C)
        p = self.kernel // 2
        h = nn.Conv(self.out_ch, (1, self.kernel, self.kernel),
                    strides=(1, self.stride, self.stride),
                    padding=((0, 0), (p, p), (p, p)), dtype=self.dtype,
                    name="conv1_0")(x)
        h = nn.Conv(self.out_ch, (3, 1, 1), padding=((2, 2), (0, 0), (0, 0)),
                    kernel_dilation=(2, 1, 1), dtype=self.dtype,
                    name="conv2_0")(h)
        return h


class Deconv(nn.Module):
    """Upsample x2 (bilinear, align_corners=True) + conv — torch
    `deconv()` helper inside the published decoder Sequentials."""
    out_ch: int
    kernel: int = 3
    pad: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = resize_bilinear_align_corners(x, 2 * H, 2 * W)
        return nn.Conv(self.out_ch, (self.kernel, self.kernel),
                       padding=self.pad, dtype=self.dtype, name="conv")(x)


class _FlowPropStep(nn.Module):
    """One step of the second-order propagation recurrence (scanned)."""
    channel: int
    n_cat: int  # backbone input = n_cat * channel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        prev1, prev2, i = carry
        feat_current, extra = xs  # extra: (H, W, n_extra*C) earlier-pass feats
        cond = jnp.concatenate([prev1, feat_current, prev2], axis=-1)
        x2 = jnp.concatenate([prev1, prev2], axis=-1)
        aligned = SecondOrderDeformableAlignment(
            self.channel, deform_groups=16, dtype=self.dtype,
            name="deform_align")(x2[None], cond[None])[0]
        feat_prop = jnp.where(i > 0, aligned, jnp.zeros_like(aligned))
        cat = [feat_current]
        if extra.shape[-1]:
            cat.append(extra)
        cat.append(feat_prop)
        h = jnp.concatenate(cat, axis=-1)[None]
        h = lrelu(nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                          name="backbone_0")(h), 0.1)
        h = nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                    name="backbone_2")(h)[0]
        feat_prop = feat_prop + h
        return (feat_prop, prev1, i + 1), feat_prop


class FlowCompBidirectionalPropagation(nn.Module):
    """backward_ pass then forward_ pass, fused per frame (the
    flow-completion variant: alignment conditioned on features only)."""
    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (T, H, W, C)
        T, H, W, C = x.shape

        def run(direction, feats_in, extra):
            step = nn.scan(
                _FlowPropStep, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=0, out_axes=0)(
                self.channel, n_cat=2 if extra.shape[-1] == 0 else 3,
                dtype=self.dtype, name=f"step_{direction}")
            init = (jnp.zeros((H, W, C), x.dtype),
                    jnp.zeros((H, W, C), x.dtype), jnp.int32(0))
            _, out = step(init, (feats_in, extra))
            return out

        none = jnp.zeros((T, H, W, 0), x.dtype)
        bwd = run("backward_", x[::-1], none)[::-1]
        fwd = run("forward_", x, bwd)
        fused = nn.Conv(self.channel, (1, 1), dtype=self.dtype,
                        name="fusion")(
            jnp.concatenate([bwd, fwd], axis=-1))
        return fused + x


class RecurrentFlowCompleteNet(nn.Module):
    """forward(masked_flows (T,H,W,2), masks (T,H,W,1)) -> completed
    flow field (T,H,W,2). H, W multiples of 8. base=32 matches the
    published checkpoint; tiny configs scale it down.

    mesh: optional ("data","model") Mesh for SPMD inference — the
    encoder/mid/decoder convs partition over the frame axis (the
    temporal (3,1,1) convs get XLA halo exchanges); only the
    propagation recurrence is constrained replicated (inherently
    sequential; every device runs it redundantly with zero per-step
    communication). GSPMD pads uneven frame counts internally, so the
    outputs are exact regardless of divisibility."""
    base: int = 32
    dtype: jnp.dtype = jnp.float32
    mesh: object = None

    def _wsc(self, x, *axes):
        # skip during init: eager with_sharding_constraint acts like a
        # device_put and rejects uneven axes; inside jit GSPMD pads them
        if self.mesh is None or self.is_initializing():
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*axes)))

    @nn.compact
    def __call__(self, masked_flows, masks):
        from videovanish_tpu.core.mesh import DATA_AXIS
        b1, b2, b4 = self.base, 2 * self.base, 4 * self.base
        x = jnp.concatenate([masked_flows.astype(self.dtype),
                             masks.astype(self.dtype)], axis=-1)[None]
        x = self._wsc(x, None, DATA_AXIS)
        # stem: (1,5,5)/2 conv, replicate padding
        x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2), (0, 0)),
                    mode="edge")
        x = lrelu(nn.Conv(b1, (1, 5, 5), strides=(1, 2, 2), padding="VALID",
                          dtype=self.dtype, name="downsample_0")(x))
        e1 = lrelu(P3DBlock(b1, 3, 1, self.dtype, name="encoder1_0")(x))
        e1 = lrelu(P3DBlock(b2, 3, 2, self.dtype, name="encoder1_2")(e1))
        e2 = lrelu(P3DBlock(b2, 3, 1, self.dtype, name="encoder2_0")(e1))
        e2 = lrelu(P3DBlock(b4, 3, 2, self.dtype, name="encoder2_2")(e2))

        m = e2
        for i, dil in enumerate((3, 2, 1)):
            m = lrelu(nn.Conv(
                b4, (1, 3, 3), padding=((0, 0), (dil, dil), (dil, dil)),
                kernel_dilation=(1, dil, dil), dtype=self.dtype,
                name=f"mid_dilation_{2 * i}")(m))

        feat = FlowCompBidirectionalPropagation(
            b4, self.dtype, name="feat_prop_module")(self._wsc(m[0]))
        feat = self._wsc(feat, DATA_AXIS)

        d2 = lrelu(nn.Conv(b4, (3, 3), padding=1, dtype=self.dtype,
                           name="decoder2_0")(feat))
        d2 = lrelu(Deconv(b2, 3, 1, self.dtype, name="decoder2_2")(d2))
        d2 = d2 + e1[0]
        d1 = lrelu(nn.Conv(b2, (3, 3), padding=1, dtype=self.dtype,
                           name="decoder1_0")(d2))
        d1 = lrelu(Deconv(b1, 3, 1, self.dtype, name="decoder1_2")(d1))
        u = lrelu(nn.Conv(b1, (3, 3), padding=1, dtype=self.dtype,
                          name="upsample_0")(d1))
        flow = Deconv(2, 3, 1, self.dtype, name="upsample_2")(u)
        return flow.astype(jnp.float32)

    def forward_bidirect_flow(self, flows_forward, flows_backward, masks):
        """Published driver: mask the flows in the holes, complete both
        directions, then keep completed values only inside the holes.

        flows_forward: (T-1, H, W, 2) flow t -> t+1;
        flows_backward: (T-1, H, W, 2) flow t+1 -> t;
        masks: (T, H, W, 1) hole masks.
        Returns (completed_forward, completed_backward)."""
        m_f = masks[:-1]
        m_b = masks[1:]
        masked_f = flows_forward * (1.0 - m_f)
        masked_b = flows_backward * (1.0 - m_b)
        pred_f = self(masked_f, m_f)
        pred_b = self(masked_b, m_b)
        out_f = pred_f * m_f + masked_f * (1.0 - m_f)
        out_b = pred_b * m_b + masked_b * (1.0 - m_b)
        return out_f, out_b
