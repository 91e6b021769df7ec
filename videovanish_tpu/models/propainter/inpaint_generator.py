"""ProPainter InpaintGenerator (Zhou et al. 2023 [external] — the
reference consumes it via the vendored ProPainter, diffuerase.py:49-57;
weights `ProPainter.pth`). Published architecture, checkpoint-compatible
key layout (core/convert.py PROPAINTER_RULES):

  group-interleave Encoder (FuseFormer lineage) at 1/4 res
  -> flow-guided dual-domain propagation (deformable alignment)
  -> SoftSplit (7x7/3 unfold + linear) -> 8 sparse window-attention
     transformer blocks (window (5,9), expanded ring keys, pooled global
     tokens, temporal stride 2) -> SoftComp (linear + fold + bias conv)
  -> deconv decoder -> tanh frames.

TPU-first notes: soft split/comp are 49 static strided slices /
scatter-adds (no gathers); window partition is pure reshapes; the
attention itself runs as one dense batched matmul over windows. The
published implementation skips attention for windows without holes
(data-dependent shapes); here every window attends — a superset
whose extra outputs only touch hole-free regions (discarded by the
pipeline's composite except for soft-comp edge bleed), keeping the
whole program shape-static under jit.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videovanish_tpu.models.propainter.deform import (
    SecondOrderDeformableAlignment,
)
from videovanish_tpu.ops.flow import flow_warp_mode
from videovanish_tpu.ops.resize import (
    resize_bilinear_align_corners, resize_bilinear_torch_half_pixel,
    resize_nearest,
)


def lrelu(x, slope=0.2):
    return nn.leaky_relu(x, slope)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------
class Encoder(nn.Module):
    """Group-interleave encoder: after layer 8 the stage-8 activation is
    re-concatenated group-wise with each later activation. Dims follow
    the self-consistent published chain (5->64/2->64->128/2->256->384,
    then grouped 640->512 g2, 768->384 g4, 640->256 g8, 512->128),
    scaled by channel/128 for tiny configs."""
    channel: int = 128
    dtype: jnp.dtype = jnp.float32

    # (out_ch, stride, groups) per conv layer (even indices of the torch
    # ModuleList; odd indices are LeakyReLU)
    SPEC = ((64, 2, 1), (64, 1, 1), (128, 2, 1), (256, 1, 1), (384, 1, 1),
            (512, 1, 2), (384, 1, 4), (256, 1, 8), (128, 1, 1))
    GROUP = (1, 2, 4, 8, 1)

    @nn.compact
    def __call__(self, x):
        # x: (T, H, W, 5)
        out = x
        x0 = None
        spec = [(ch * self.channel // 128, st, g)
                for ch, st, g in self.SPEC]
        for j, (ch, st, g) in enumerate(spec):
            i = 2 * j  # torch ModuleList index of the conv
            if i == 8:
                x0 = out
                T, h, w, c0 = x0.shape
            if i > 8:
                gN = self.GROUP[(i - 8) // 2]
                xg = x0.reshape(T, h, w, gN, c0 // gN)
                og = out.reshape(T, h, w, gN, out.shape[-1] // gN)
                out = jnp.concatenate([xg, og], axis=-1) \
                    .reshape(T, h, w, -1)
            out = lrelu(nn.Conv(ch, (3, 3), strides=(st, st), padding=1,
                                feature_group_count=g, dtype=self.dtype,
                                name=f"layers_{i}")(out))
        return out


class Deconv(nn.Module):
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


# ---------------------------------------------------------------------------
# soft split / comp (t2t fold/unfold)
# ---------------------------------------------------------------------------
KERNEL, STRIDE, PAD = 7, 3, 3


def t2t_hw(h, w):
    fh = (h + 2 * PAD - KERNEL) // STRIDE + 1
    fw = (w + 2 * PAD - KERNEL) // STRIDE + 1
    return fh, fw


# --- tap-major t2t: the TPU-fast layout ---------------------------------
# torch's unfold/fold order the patch axis channel-major (c*49 + k): the
# 49-tap axis lands in the LANE dimension interleaved with C, and every
# per-tap slice becomes a lane shuffle (profiled at 10 GB/s — the
# SoftComp fold alone was 11% of the window program). Tap-major order
# (k*C + c) keeps C as pure lane tiles: per-tap slices/updates touch only
# MAJOR axes. The embedding weights stay in the checkpoint's
# channel-major layout; _PermutedDense reorders the (small) kernel at
# apply time instead of relayouting the (large) activations.
# (The channel-major reference layout — torch's own unfold/fold order —
# lives only in the oracle: tests/test_propainter_oracle.py exercises
# this tap-major path against torch F.unfold/F.fold directly, so no
# channel-major jax twin is kept here to drift.)

def tapmajor_perm(C: int) -> np.ndarray:
    """perm[k*C + c] = c*49 + k: gather rows/cols of a channel-major
    weight into tap-major order."""
    K = KERNEL * KERNEL
    return (np.arange(C)[None, :] * K
            + np.arange(K)[:, None]).reshape(-1)


def unfold_t2t_tapmajor(x):
    """(B, H, W, C) -> (B, L, 49*C), tap-major (tap outer, channel inner)."""
    B, H, W, C = x.shape
    fh, fw = t2t_hw(H, W)
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    cols = [xp[:, ky:ky + STRIDE * fh:STRIDE, kx:kx + STRIDE * fw:STRIDE, :]
            for ky in range(KERNEL) for kx in range(KERNEL)]
    p = jnp.stack(cols, axis=3)               # (B, fh, fw, K, C)
    return p.reshape(B, fh * fw, KERNEL * KERNEL * C)


def fold_t2t_tapmajor(x, out_hw):
    """(B, L, 49*C) tap-major -> (B, H, W, C) overlap scatter-add."""
    B, L, KC = x.shape
    K = KERNEL * KERNEL
    C = KC // K
    H, W = out_hw
    fh, fw = t2t_hw(H, W)
    p = x.reshape(B, fh, fw, K, C)
    out = jnp.zeros((B, H + 2 * PAD, W + 2 * PAD, C), x.dtype)
    for ky in range(KERNEL):
        for kx in range(KERNEL):
            out = out.at[:, ky:ky + STRIDE * fh:STRIDE,
                         kx:kx + STRIDE * fw:STRIDE, :].add(
                p[:, :, :, ky * KERNEL + kx, :])
    return out[:, PAD:PAD + H, PAD:PAD + W, :]


class _PermutedDense(nn.Module):
    """nn.Dense with the canonical checkpoint-layout kernel, contracted
    against tap-major activations by permuting the (small) kernel at
    apply time: perm_in reorders kernel rows (input axis is tap-major),
    perm_out reorders kernel columns + bias (output comes out tap-major).
    Param tree (name/kernel, name/bias) is identical to nn.Dense."""
    features: int
    perm_in: tuple = None
    perm_out: tuple = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if self.perm_in is not None:
            kernel = kernel[np.asarray(self.perm_in)]
        if self.perm_out is not None:
            kernel = kernel[:, np.asarray(self.perm_out)]
            bias = bias[np.asarray(self.perm_out)]
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class SoftSplit(nn.Module):
    hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (T, H, W, C) -> (T, fh, fw, hidden); tap-major unfold + a
        # row-permuted kernel == torch unfold + canonical kernel
        T, H, W, C = x.shape
        feat = unfold_t2t_tapmajor(x)
        feat = _PermutedDense(self.hidden,
                              perm_in=tuple(tapmajor_perm(C)),
                              dtype=self.dtype, name="embedding")(feat)
        fh, fw = t2t_hw(H, W)
        return feat.reshape(T, fh, fw, self.hidden)


class SoftComp(nn.Module):
    channel: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw):
        # x: (T, fh, fw, hidden) -> (T, H, W, channel); the embedding
        # emits tap-major patches (column-permuted kernel), folded by the
        # lane-friendly tap-major fold
        T = x.shape[0]
        feat = _PermutedDense(self.channel * KERNEL * KERNEL,
                              perm_out=tuple(tapmajor_perm(self.channel)),
                              dtype=self.dtype, name="embedding")(
            x.reshape(T, -1, x.shape[-1]))
        feat = fold_t2t_tapmajor(feat, out_hw)
        return nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                       name="bias_conv")(feat)


# ---------------------------------------------------------------------------
# sparse window attention
# ---------------------------------------------------------------------------
def _ring_indices(window, expand):
    """Static index list of the 4-roll expanded-ring key positions
    (published valid_ind_rolled derivation)."""
    wh, ww = window
    e0, e1 = expand
    masks = []
    for corner in range(4):
        m = np.ones((wh, ww), bool)
        ys = slice(0, wh - e0) if corner < 2 else slice(e0, wh)
        xs = slice(0, ww - e1) if corner % 2 == 0 else slice(e1, ww)
        m[ys, xs] = False
        masks.append(m)
    flat = np.concatenate([m.reshape(-1) for m in masks])
    return np.nonzero(flat)[0]


def window_partition_thwc(x, wh, ww):
    """(T, H, W, C) -> (nW, T, wh*ww, C); H, W divisible by window."""
    T, H, W, C = x.shape
    x = x.reshape(T, H // wh, wh, W // ww, ww, C)
    x = x.transpose(1, 3, 0, 2, 4, 5)
    return x.reshape((H // wh) * (W // ww), T, wh * ww, C)


class SparseWindowAttention(nn.Module):
    dim: int = 512
    n_head: int = 4
    window: tuple = (5, 9)
    pool: tuple = (4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_ind):
        """x: (T, H, W, C); t_ind: static tuple of key frames."""
        T, H, W, C = x.shape
        wh, ww = self.window
        e0, e1 = (wh + 1) // 2, (ww + 1) // 2
        hd = C // self.n_head
        n_wh = math.ceil(H / wh)
        n_ww = math.ceil(W / ww)
        newH, newW = n_wh * wh, n_ww * ww
        if (newH, newW) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, newH - H), (0, newW - W), (0, 0)))

        query_l = nn.Dense(C, dtype=self.dtype, name="query")
        key_l = nn.Dense(C, dtype=self.dtype, name="key")
        value_l = nn.Dense(C, dtype=self.dtype, name="value")
        q = query_l(x)
        k = key_l(x)
        v = value_l(x)

        t_sel = jnp.asarray(t_ind, jnp.int32)
        k_s, v_s = k[t_sel], v[t_sel]
        Tk = len(t_ind)

        win_q = window_partition_thwc(q, wh, ww)          # (nW, T, 45, C)
        win_k = window_partition_thwc(k_s, wh, ww)        # (nW, Tk, 45, C)
        win_v = window_partition_thwc(v_s, wh, ww)

        # expanded-ring keys: 4 diagonal rolls, ring positions only
        ring = _ring_indices(self.window, (e0, e1))
        rolls = [(-e0, -e1), (-e0, e1), (e0, -e1), (e0, e1)]
        k_roll = jnp.concatenate(
            [window_partition_thwc(jnp.roll(k_s, r, axis=(1, 2)), wh, ww)
             for r in rolls], axis=2)[:, :, ring]
        v_roll = jnp.concatenate(
            [window_partition_thwc(jnp.roll(v_s, r, axis=(1, 2)), wh, ww)
             for r in rolls], axis=2)[:, :, ring]

        # pooled global tokens: learnable depthwise avg conv (published
        # pool_layer), keys/values via the same projections
        ph, pw = self.pool
        pooled = nn.Conv(C, (ph, pw), strides=(ph, pw), padding="VALID",
                         feature_group_count=C, dtype=self.dtype,
                         name="pool_layer")(x[t_sel])   # (Tk, ph', pw', C)
        pool_k = key_l(pooled)
        pool_v = value_l(pooled)
        nP = pooled.shape[1] * pooled.shape[2]
        nW = n_wh * n_ww
        pool_k = jnp.broadcast_to(pool_k.reshape(1, Tk, nP, C),
                                  (nW, Tk, nP, C))
        pool_v = jnp.broadcast_to(pool_v.reshape(1, Tk, nP, C),
                                  (nW, Tk, nP, C))

        k_all = jnp.concatenate([win_k, k_roll, pool_k], axis=2)
        v_all = jnp.concatenate([win_v, v_roll, pool_v], axis=2)

        def heads(a):
            nWa, Ta, S, _ = a.shape
            return a.reshape(nWa, Ta * S, self.n_head, hd) \
                .transpose(0, 2, 1, 3)

        qh, kh_, vh = heads(win_q), heads(k_all), heads(v_all)
        att = jnp.einsum("whqd,whkd->whqk", qh, kh_,
                         preferred_element_type=jnp.float32)
        att = att * (1.0 / math.sqrt(hd))
        att = jax.nn.softmax(att, axis=-1).astype(vh.dtype)
        out = jnp.einsum("whqk,whkd->whqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(nW, T, wh * ww, C)

        # merge windows back
        out = out.reshape(n_wh, n_ww, T, wh, ww, C).transpose(2, 0, 3, 1, 4, 5)
        out = out.reshape(T, newH, newW, C)[:, :H, :W]
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class FusionFeedForward(nn.Module):
    dim: int = 512
    hidden: int = 1960  # must be a multiple of 49 (folded as C*49)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw):
        # x: (T, fh, fw, C)
        T, fh, fw, C = x.shape
        K = KERNEL * KERNEL
        kc = self.hidden // K  # 1960 = 40 * 49
        H, W = out_hw
        # fc1 emits tap-major (column-permuted kernel; torch-equivalent
        # terms), and the fold/unfold round trip runs with T*kc on the
        # LANE axis: kc alone (40) would waste 2/3 of every 128-lane
        # tile, and channel-major (the torch layout) interleaves the tap
        # axis into lanes where every per-tap slice is a 10 GB/s lane
        # shuffle (profiled; see fold_t2t_tapmajor). The fold's spatial
        # scatter is independent of T and channel, so T rides the lane
        # axis for free: 640 lanes = 5 exact tiles.
        h = _PermutedDense(self.hidden,
                           perm_out=tuple(tapmajor_perm(kc)),
                           dtype=self.dtype, name="fc1_0")(
            x.reshape(T, fh * fw, C))
        # 2D PHASE-DECOMPOSED fold/unfold: grid cell (ry, rx, gy, gx) is
        # padded-grid pixel (3*gy + ry, 3*gx + rx), so every stride-3 tap
        # slice becomes a CONTIGUOUS block slice (stride-3 along the
        # sublane axis ran at ~12 GB/s); taps ride the MAJOR axis (a
        # single-sublane tap slice wastes 7/8 of every (8,128) tile).
        p = h.reshape(T, fh, fw, K, kc).transpose(3, 1, 2, 0, 4) \
            .reshape(K, fh, fw, T * kc)
        GH, GW = fh + 2, fw + 2   # gy in [ky//3, ky//3+fh), ky//3 <= 2
        out = jnp.zeros((3, 3, GH, GW, T * kc), h.dtype)
        cnt = jnp.zeros((3, 3, GH, GW, 1), h.dtype)
        one = jnp.ones((fh, fw, 1), h.dtype)
        for ky in range(KERNEL):
            for kx in range(KERNEL):
                at = (ky % 3, kx % 3, slice(ky // 3, ky // 3 + fh),
                      slice(kx // 3, kx // 3 + fw))
                out = out.at[at].add(p[ky * KERNEL + kx])
                cnt = cnt.at[at].add(one)
        # interior mask (pixel inside the (H, W) crop) as a compile-time
        # constant; outside cells are zeroed exactly like the reference's
        # crop -> re-pad-with-zeros round trip
        row = 3 * np.arange(GH)[None, :] + np.arange(3)[:, None]  # (3,GH)
        col = 3 * np.arange(GW)[None, :] + np.arange(3)[:, None]
        m = ((row >= PAD) & (row < PAD + H))[:, None, :, None] \
            & ((col >= PAD) & (col < PAD + W))[None, :, None, :]
        mask = jnp.asarray(m[..., None])             # (3, 3, GH, GW, 1)
        g = jnp.where(mask, out / jnp.maximum(cnt, 1), 0)
        u = jnp.stack(
            [g[ky % 3, kx % 3, ky // 3:ky // 3 + fh, kx // 3:kx // 3 + fw]
             for ky in range(KERNEL) for kx in range(KERNEL)], axis=0)
        h = u.reshape(K, fh, fw, T, kc).transpose(3, 1, 2, 0, 4) \
            .reshape(T, fh * fw, K * kc)
        h = nn.gelu(h.astype(jnp.float32), approximate=False) \
            .astype(self.dtype)
        h = _PermutedDense(self.dim, perm_in=tuple(tapmajor_perm(kc)),
                           dtype=self.dtype, name="fc2_1")(h)
        return h.reshape(T, fh, fw, self.dim)


class TemporalSparseTransformer(nn.Module):
    dim: int = 512
    n_head: int = 4
    window: tuple = (5, 9)
    pool: tuple = (4, 4)
    dtype: jnp.dtype = jnp.float32

    ffn_hidden: int = 1960

    @nn.compact
    def __call__(self, x, fold_hw, t_ind):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm1")(x).astype(x.dtype)
        x = x + SparseWindowAttention(self.dim, self.n_head, self.window,
                                      self.pool, dtype=self.dtype,
                                      name="attention")(h, t_ind)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(x).astype(x.dtype)
        x = x + FusionFeedForward(self.dim, self.ffn_hidden,
                                  dtype=self.dtype,
                                  name="mlp")(h, fold_hw)
        return x


class TemporalSparseTransformerBlock(nn.Module):
    depths: int = 8
    dim: int = 512
    n_head: int = 4
    window: tuple = (5, 9)
    pool: tuple = (4, 4)
    t_dilation: int = 2
    ffn_hidden: int = 1960
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold_hw):
        T = x.shape[0]
        for i in range(self.depths):
            t_ind = tuple(range(i % self.t_dilation, T, self.t_dilation))
            x = TemporalSparseTransformer(
                self.dim, self.n_head, self.window, self.pool,
                dtype=self.dtype, ffn_hidden=self.ffn_hidden,
                name=f"transformer_{i}")(x, fold_hw, t_ind)
        return x


# ---------------------------------------------------------------------------
# flow-guided dual-domain propagation (learnable variant)
# ---------------------------------------------------------------------------
def fb_consistency_check(flow_fw, flow_bw, alpha1=0.01, alpha2=0.5):
    """1 where forward/backward flows agree (published check)."""
    flow_bw_warped = flow_warp_mode(flow_bw, flow_fw, "bilinear")
    flow_diff = flow_fw + flow_bw_warped
    norm = (flow_fw ** 2).sum(-1, keepdims=True) \
        + (flow_bw_warped ** 2).sum(-1, keepdims=True)
    thresh = alpha1 * norm + alpha2
    return ((flow_diff ** 2).sum(-1, keepdims=True) < thresh) \
        .astype(jnp.float32)


class _FeatPropStep(nn.Module):
    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop, i = carry
        feat_current, mask_current, flow_prop, flow_check = xs
        valid = fb_consistency_check(flow_prop[None], flow_check[None])[0]
        warped = flow_warp_mode(feat_prop[None], flow_prop[None],
                                "bilinear")[0]
        cond = jnp.concatenate(
            [feat_current, warped, flow_prop, valid, mask_current], -1)
        aligned = SecondOrderDeformableAlignment(
            self.channel, deform_groups=16, dtype=self.dtype,
            name="deform_align")(feat_prop[None], cond[None],
                                 flow_prop[None])[0]
        feat_prop = jnp.where(i > 0, aligned, feat_current)
        h = jnp.concatenate([feat_current, feat_prop, mask_current], -1)
        h = lrelu(nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                          name="backbone_0")(h[None]))
        h = nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                    name="backbone_2")(h)[0]
        feat_prop = feat_prop + h
        return (feat_prop, i + 1), feat_prop


class DualDomainPropagation(nn.Module):
    """propainter.py BidirectionalPropagation, learnable=True: flow-
    guided deformable alignment over features, backward then forward,
    fused with a residual."""
    channel: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, flows_f, flows_b, masks):
        """x: (T, H, W, C); flows_f: (T-1, H, W, 2) flow t->t+1;
        flows_b: (T-1, H, W, 2) flow t+1->t; masks: (T, H, W, 2)
        (mask_in, mask_updated)."""
        T, H, W, C = x.shape

        def run(name, feats_in, masks_in, fl_prop, fl_check):
            step = nn.scan(
                _FeatPropStep, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=0, out_axes=0)(
                self.channel, dtype=self.dtype, name=f"step_{name}")
            zero_fl = jnp.zeros((1, H, W, 2), jnp.float32)
            init = (jnp.zeros((H, W, C), x.dtype), jnp.int32(0))
            _, out = step(init, (feats_in, masks_in,
                                 jnp.concatenate([zero_fl, fl_prop], 0),
                                 jnp.concatenate([zero_fl, fl_check], 0)))
            return out

        # backward pass: reversed frames, propagate with forward flows
        bwd = run("backward_1", x[::-1], masks[::-1],
                  flows_f[::-1], flows_b[::-1])[::-1]
        fwd = run("forward_1", bwd, masks, flows_b, flows_f)

        fuse_in = jnp.concatenate([bwd, fwd, masks], axis=-1)
        h = lrelu(nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                          name="fuse_0")(fuse_in))
        out = nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype,
                      name="fuse_2")(h)
        return out + x


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------
class InpaintGenerator(nn.Module):
    channel: int = 128
    hidden: int = 512
    depths: int = 8
    n_head: int = 4
    window: tuple = (5, 9)
    pool: tuple = (4, 4)
    t_dilation: int = 2
    ffn_channels: int = 40
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, masked_frames, completed_flows, masks_in,
                 masks_updated, l_t: int):
        """masked_frames: (T, H, W, 3) in [-1, 1] (first l_t local, rest
        refs); completed_flows: (flows_f, flows_b) each (l_t-1, H, W, 2);
        masks_*: (T, H, W, 1). Returns (l_t, H, W, 3) in [-1, 1]."""
        T, H, W, _ = masked_frames.shape
        enc_in = jnp.concatenate(
            [masked_frames, masks_in, masks_updated], -1).astype(self.dtype)
        enc_feat = Encoder(self.channel, dtype=self.dtype,
                           name="encoder")(enc_in)
        h, w = enc_feat.shape[1], enc_feat.shape[2]

        flows_f, flows_b = completed_flows
        ds_f = resize_bilinear_torch_half_pixel(flows_f, h, w) / 4.0
        ds_b = resize_bilinear_torch_half_pixel(flows_b, h, w) / 4.0
        ds_mask_in = resize_nearest(masks_in, h, w)
        ds_mask_upd = resize_nearest(masks_updated[:l_t], h, w)
        prop_mask = jnp.concatenate([ds_mask_in[:l_t], ds_mask_upd], -1)

        local_feat = DualDomainPropagation(
            self.channel, dtype=self.dtype, name="feat_prop_module")(
            enc_feat[:l_t], ds_f, ds_b, prop_mask)
        enc_feat = jnp.concatenate([local_feat, enc_feat[l_t:]], axis=0)

        trans = SoftSplit(self.hidden, dtype=self.dtype,
                          name="ss")(enc_feat)
        trans = TemporalSparseTransformerBlock(
            self.depths, self.hidden, self.n_head, self.window, self.pool,
            self.t_dilation, ffn_hidden=49 * self.ffn_channels,
            dtype=self.dtype, name="transformers")(trans, (h, w))
        trans = SoftComp(self.channel, dtype=self.dtype,
                         name="sc")(trans, (h, w))
        enc_feat = enc_feat + trans

        c2 = self.channel  # published decoder widths scale with channel
        x = enc_feat[:l_t]
        x = lrelu(Deconv(c2, dtype=self.dtype, name="decoder_0")(x))
        x = lrelu(nn.Conv(c2 // 2, (3, 3), padding=1, dtype=self.dtype,
                          name="decoder_2")(x))
        x = lrelu(Deconv(c2 // 2, dtype=self.dtype, name="decoder_4")(x))
        x = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                    name="decoder_6")(x)
        return jnp.tanh(x.astype(jnp.float32))
