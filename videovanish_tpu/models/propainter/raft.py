"""RAFT-style optical flow, flax/NHWC ([external] per SURVEY.md §2c:
the ProPainter prior starts from RAFT flow between consecutive frames).

TPU-first: the refinement loop is a GRU unrolled a static number of
times (config.raft_iters) so the whole estimator is one XLA program.
The correlation features avoid RAFT's precomputed all-pairs volume +
per-token window gather entirely — that lookup is ~2.4e9 SCALAR gathers
per 48-frame chunk and measured 32.6 s on a v5e. Because correlation is
linear in f2, average-pooling the correlation volume over the f2 axis
equals correlating against average-pooled f2 FEATURES; so each
iteration (a) bilinear-warps each pooled f2 level to the current flow
(whole-row gathers, the fast TPU sampling primitive) and (b) takes a
local correlation against (2r+1)^2 STATIC token shifts at stride 2^l
(pure VPU multiply-reduces). This is the PWC-Net neighborhood
approximation of RAFT's lookup (offsets sample around neighboring
tokens' warp targets rather than exact coordinate offsets); the corr
feature layout and the parameter tree are unchanged.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.flow import bilinear_sample, local_corr


class ResUnit(nn.Module):
    ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                 name="norm1")(h).astype(x.dtype))
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                         name="norm2")(h).astype(x.dtype)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="short")(x)
        return nn.relu(x + h)


class FlowEncoder(nn.Module):
    """RGB -> 1/8-resolution features."""
    out_ch: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out_ch
        h = nn.Conv(c // 2, (7, 7), strides=(2, 2), padding=3,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                 name="norm1")(h).astype(x.dtype))
        h = ResUnit(c // 2, dtype=self.dtype, name="res1")(h)
        h = ResUnit(c * 3 // 4, stride=2, dtype=self.dtype, name="res2")(h)
        h = ResUnit(c, stride=2, dtype=self.dtype, name="res3")(h)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="out")(h)


class ConvGRU(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1,
                               dtype=self.dtype, name="convz")(hx)
                       .astype(jnp.float32))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1,
                               dtype=self.dtype, name="convr")(hx)
                       .astype(jnp.float32))
        q = nn.tanh(nn.Conv(self.hidden, (3, 3), padding=1,
                            dtype=self.dtype, name="convq")(
            jnp.concatenate([r.astype(h.dtype) * h, x], axis=-1))
            .astype(jnp.float32))
        return ((1 - z) * h.astype(jnp.float32) + z * q).astype(h.dtype)


class UpdateBlock(nn.Module):
    hidden: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, corr_feat, flow):
        cf = nn.relu(nn.Conv(96, (1, 1), dtype=self.dtype,
                             name="corr_enc")(corr_feat))
        ff = nn.relu(nn.Conv(32, (7, 7), padding=3, dtype=self.dtype,
                             name="flow_enc")(flow))
        x = jnp.concatenate([cf, ff], axis=-1)
        x = nn.relu(nn.Conv(self.hidden - 2, (3, 3), padding=1,
                            dtype=self.dtype, name="mix")(x))
        x = jnp.concatenate([x, flow.astype(x.dtype)], axis=-1)
        h = ConvGRU(self.hidden, dtype=self.dtype, name="gru")(h, x)
        dflow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                        name="flow_head")(
            nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                            name="flow_head_1")(h)))
        return h, dflow.astype(jnp.float32)


class RaftLite(nn.Module):
    """Estimate flow from frame1 -> frame2 at 1/8 res, upsampled x8."""
    feat_ch: int = 128
    hidden: int = 96
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2):
        """img1/img2: (B, H, W, 3) in [-1, 1]. Returns (B, H, W, 2) flow."""
        B, H, W, _ = img1.shape
        enc = FlowEncoder(self.feat_ch, dtype=self.dtype, name="fnet")
        f1 = enc(img1)
        f2 = enc(img2)
        ctx = nn.relu(FlowEncoder(self.hidden, dtype=self.dtype,
                                  name="cnet")(img1))
        h8, w8 = f1.shape[1], f1.shape[2]

        # f2 feature pyramid (== pooling RAFT's correlation volume over
        # the f2 axis, by linearity of the correlation)
        pyr = [f2]
        for _ in range(self.corr_levels - 1):
            p = pyr[-1]
            ph, pw = p.shape[1] % 2, p.shape[2] % 2
            if ph or pw:
                p = jnp.pad(p, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            mode="edge")
            pyr.append(nn.avg_pool(p, (2, 2), strides=(2, 2)))

        gy = jnp.arange(h8, dtype=jnp.float32)
        gx = jnp.arange(w8, dtype=jnp.float32)
        base = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (h,w,2)
        base = jnp.broadcast_to(base[None], (B, h8, w8, 2))

        flow = jnp.zeros((B, h8, w8, 2), jnp.float32)
        h = jnp.tanh(ctx.astype(jnp.float32)).astype(img1.dtype)
        update = UpdateBlock(self.hidden, dtype=self.dtype, name="update")

        for _ in range(self.iters):
            coords = base + flow
            corr_feats = []
            for l in range(self.corr_levels):
                # sample pooled f2 at each token's warp target, then
                # correlate against static token shifts at level stride
                f2w = bilinear_sample(pyr[l], coords / (2 ** l))
                corr_feats.append(local_corr(f1, f2w, self.corr_radius,
                                             stride=2 ** l))
            corr = jnp.concatenate(corr_feats, axis=-1).astype(img1.dtype)
            h, dflow = update(h, corr, flow.astype(img1.dtype))
            flow = flow + dflow

        flow_full = jax.image.resize(
            flow * 8.0, (B, H, W, 2), method="bilinear")
        return flow_full
