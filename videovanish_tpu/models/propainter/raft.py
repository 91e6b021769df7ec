"""RAFT optical flow (Teed & Deng 2020), flax/NHWC — the exact published
architecture so the `raft-things.pth` weights ProPainter pins load
directly (reference call chain: diffuerase.py:49-57 -> ProPainter ->
vendored RAFT_bi [external]). Scope names mirror the torch checkpoint
keys (module.fnet / cnet / update_block...) so core/convert.py's
RAFT_RULES stay a pure name map; parity is gated per-module against a
hand-written torch oracle (tests/test_propainter_oracle.py).

TPU-first lookup: RAFT's correlation lookup is, per level, a bilinear
sample of a per-query (Hl, Wl) correlation plane at 81 offsets around
the warp target. Gathers are the one thing TPUs do badly — an xprof
capture showed a take_along_axis row gather here eating 71% of RAFT's
device time (16 ms per call vs 1.3 ms for the equivalent one-hot
contraction). So the volume is built ONCE per pair on the MXU (an
all-pairs einsum — exactly torch's matmul volume), and each iteration's
lookup is GATHER-FREE:
  rows:  a one-hot contraction over the y axis (MXU dot; out-of-range
         rows have an all-zero one-hot, which IS the zero padding),
  cols:  a one-hot contraction over Wl,
  blend: the shared-floor bilinear trick — the 81 offsets of one query
         share a single (wx, wy) fractional weight, so (2r+2)^2 integer
         taps reconstruct all 81 bilinear samples exactly.
Zero-padding semantics match torch grid_sample(align_corners=True,
padding_mode='zeros') bit-for-bit in exact arithmetic.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm(x, eps: float = 1e-5):
    """torch nn.InstanceNorm2d(affine=False): per-sample, per-channel
    normalization over H, W (biased variance), no learned affine."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """torch BatchNorm2d in eval mode: running stats are parameters."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (C,),
                          jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (C,),
                         jnp.float32)
        xf = x.astype(jnp.float32)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"  # instance | batch | none
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name):
        if self.norm == "batch":
            return FrozenBatchNorm(name=name)
        if self.norm == "instance":
            return instance_norm
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm("norm1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(self._norm("norm2")(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample_conv")(x)
            x = self._norm("downsample_norm")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT feature/context encoder: 7x7/2 stem + 3 residual stages
    (64, 96/2, 128/2) + 1x1 head -> 1/8 resolution."""
    output_dim: int = 256
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                    name="conv1")(x)
        if self.norm == "batch":
            h = FrozenBatchNorm(name="norm1")(h)
        elif self.norm == "instance":
            h = instance_norm(h)
        h = nn.relu(h)
        for i, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)],
                                             start=1):
            h = ResidualBlock(planes, stride, self.norm, self.dtype,
                              name=f"layer{i}_0")(h)
            h = ResidualBlock(planes, 1, self.norm, self.dtype,
                              name=f"layer{i}_1")(h)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(h)


class BasicMotionEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype,
                              name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                              name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                              name="convf1")(flow.astype(corr.dtype)))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                              name="convf2")(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=self.dtype,
                              name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        def gate(name, kern, pad, inp):
            return nn.Conv(self.hidden, kern, padding=pad, dtype=self.dtype,
                           name=name)(inp).astype(jnp.float32)

        for suffix, kern, pad in [("1", (1, 5), ((0, 0), (2, 2))),
                                  ("2", (5, 1), ((2, 2), (0, 0)))]:
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(gate(f"convz{suffix}", kern, pad, hx))
            r = nn.sigmoid(gate(f"convr{suffix}", kern, pad, hx))
            q = jnp.tanh(gate(
                f"convq{suffix}", kern, pad,
                jnp.concatenate([r.astype(h.dtype) * h, x], axis=-1)))
            h = ((1 - z) * h.astype(jnp.float32) + z * q).astype(h.dtype)
        return h


class FlowHead(nn.Module):
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                            name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="conv2")(h).astype(jnp.float32)


class BasicUpdateBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(
            flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(128, dtype=self.dtype, name="gru")(net, x)
        dflow = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="mask_0")(net))
        m = nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_2")(m)
        return net, 0.25 * m.astype(jnp.float32), dflow


# ---------------------------------------------------------------------------
# correlation volume + lookup
# ---------------------------------------------------------------------------
def corr_volume_pyramid(f1, f2, num_levels: int = 4):
    """All-pairs correlation volume + avg-pooled pyramid over f2 dims.

    f1, f2: (B, h, w, C). Returns list of (B, h*w, Hl, Wl) f32 volumes,
    already scaled by 1/sqrt(C) (torch CorrBlock.corr). Pooling matches
    torch avg_pool2d(2, 2): floor mode, odd edges dropped.
    """
    B, h, w, C = f1.shape
    corr = jnp.einsum("bxc,byc->bxy", f1.reshape(B, h * w, C),
                      f2.reshape(B, h * w, C),
                      preferred_element_type=jnp.float32)
    corr = corr.astype(jnp.float32) / jnp.sqrt(jnp.float32(C))
    vols = [corr.reshape(B, h * w, h, w)]
    for _ in range(num_levels - 1):
        v = vols[-1]
        Hl, Wl = v.shape[2], v.shape[3]
        v = v[:, :, : 2 * (Hl // 2), : 2 * (Wl // 2)]
        v = v.reshape(B, v.shape[1], Hl // 2, 2, Wl // 2, 2).mean((3, 5))
        vols.append(v)
    return vols


def corr_lookup(vols, coords, radius: int = 4):
    """Sample each level's per-query correlation plane at the 81 integer
    offsets around coords/2^l with bilinear weights (zero padding).

    coords: (B, h, w, 2) (x, y) in level-0 token units.
    Returns (B, h, w, num_levels*(2r+1)^2) f32, channels ordered exactly
    as torch RAFT: level-major, then x-offset-major (see CorrBlock's
    meshgrid(dy, dx) quirk: the first offset axis is applied to x).
    """
    B, h, w, _ = coords.shape
    q = h * w
    r = radius
    taps_rng = jnp.arange(-r, r + 2)  # 2r+2 shared-floor integer taps
    out = []
    for lvl, V in enumerate(vols):
        Hl, Wl = V.shape[2], V.shape[3]
        c = coords.reshape(B, q, 2).astype(jnp.float32) / (2 ** lvl)
        x0 = jnp.floor(c[..., 0])
        y0 = jnp.floor(c[..., 1])
        wx = (c[..., 0] - x0)[..., None, None]
        wy = (c[..., 1] - y0)[..., None, None]
        # y rows: one-hot contraction over Hl (out-of-range rows have an
        # all-zero one-hot -> zero padding, no clip/mask needed)
        yi = y0[..., None].astype(jnp.int32) + taps_rng
        onehot_y = (yi[..., None] == jnp.arange(Hl)).astype(V.dtype)
        rows = jnp.einsum("bqyh,bqhw->bqyw", onehot_y, V)
        # x columns: one-hot contraction over Wl, emitted x-major
        # directly (torch CorrBlock's meshgrid(dy, dx) quirk applies the
        # first offset axis to x) so no transpose is needed afterwards
        xi = x0[..., None].astype(jnp.int32) + taps_rng
        onehot_x = (xi[..., None] == jnp.arange(Wl)).astype(rows.dtype)
        taps = jnp.einsum("bqyw,bqxw->bqxy", rows, onehot_x)
        # shared-floor bilinear blend of the 4 integer corners
        t00 = taps[..., :-1, :-1]   # (dx, dy)
        t01 = taps[..., 1:, :-1]    # x + 1
        t10 = taps[..., :-1, 1:]    # y + 1
        t11 = taps[..., 1:, 1:]
        vals = ((1 - wy) * (1 - wx) * t00 + (1 - wy) * wx * t01
                + wy * (1 - wx) * t10 + wy * wx * t11)  # (B,q,dx,dy)
        out.append(vals.reshape(B, q, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1).reshape(B, h, w, -1)


def upsample_flow_convex(flow, mask):
    """RAFT convex upsampling: 8x via learned 3x3-neighborhood weights.

    flow: (B, h, w, 2); mask: (B, h, w, 576) = 9 * 8 * 8 (torch channel
    order: neighbor k outer, then the 8x8 sub-pixel grid).
    """
    B, h, w, _ = flow.shape
    m = mask.reshape(B, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    f8 = (8.0 * flow).astype(jnp.float32)
    pad = jnp.pad(f8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbr = jnp.stack([pad[:, dy:dy + h, dx:dx + w, :]
                     for dy in range(3) for dx in range(3)], axis=3)
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", m, nbr)  # (B,h,w,8,8,2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """Full RAFT (large config: hdim=cdim=128, corr 4x4). Input images in
    [-1, 1] (the vendored RAFT_bi's convention); returns full-resolution
    flow img1 -> img2. H, W must be multiples of 8."""
    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1, image2):
        B, H, W, _ = image1.shape
        fnet = BasicEncoder(256, "instance", self.dtype, name="fnet")
        f12 = fnet(jnp.concatenate([image1, image2], axis=0))
        f1, f2 = f12[:B], f12[B:]
        cnet = BasicEncoder(256, "batch", self.dtype, name="cnet")(image1)
        net = jnp.tanh(cnet[..., :128].astype(jnp.float32)) \
            .astype(image1.dtype)
        inp = nn.relu(cnet[..., 128:])

        vols = corr_volume_pyramid(f1.astype(jnp.float32),
                                   f2.astype(jnp.float32), self.corr_levels)

        h8, w8 = f1.shape[1], f1.shape[2]
        gx = jnp.arange(w8, dtype=jnp.float32)
        gy = jnp.arange(h8, dtype=jnp.float32)
        base = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
        base = jnp.broadcast_to(base[None], (B, h8, w8, 2))

        update = BasicUpdateBlock(dtype=self.dtype, name="update_block")
        flow = jnp.zeros((B, h8, w8, 2), jnp.float32)
        up_mask = None
        for _ in range(self.iters):
            corr = corr_lookup(vols, base + flow, self.corr_radius) \
                .astype(image1.dtype)
            net, up_mask, dflow = update(net, inp, corr,
                                         flow.astype(image1.dtype))
            flow = flow + dflow
        return upsample_flow_convex(flow, up_mask)
