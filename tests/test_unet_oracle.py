"""Full-model UNet + BrushNet torch oracle (tiny config, t_frames=1).

The block-level parity tests (test_parity.py) gate each module; this
gates the COMPOSITION — skip-connection order, time-embedding wiring,
BrushNet residual injection points, and the full-model converter name
map (UNET_RULES/UNET_SPECIALS, including diffusers' 1x1-conv
proj_in/proj_out -> Dense). The torch model mirrors the public
SD1.5/BrushNet topology the reference consumes via diffusers
(diffuerase.py:39-45; internals [external] per SURVEY.md §2c).
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from videovanish_tpu.core.convert import (
    UNET_RULES, UNET_SPECIALS, convert_state_dict,
)
from tests.test_parity import (
    TorchAttention, TorchFeedForward, TorchResnetBlock,
    TorchTransformerBlock,
)

CH = (32, 64, 64, 64)
LAYERS = 1
HEADS = 8
CTX = 64
TEMB = CH[0] * 4


def gn_groups(c):
    return 32 if c % 32 == 0 else math.gcd(c, 32)


class TorchTransformer2D(tnn.Module):
    """GN -> 1x1-conv proj_in -> transformer block -> 1x1-conv proj_out
    (+residual): the SD1.5 use_linear_projection=False layout."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm = tnn.GroupNorm(gn_groups(dim), dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, dim, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TorchTransformerBlock(dim, heads, ctx_dim)])
        self.proj_out = tnn.Conv2d(dim, dim, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.flatten(2).transpose(1, 2)
        h = self.transformer_blocks[0](h, ctx)
        h = h.transpose(1, 2).reshape(B, C, H, W)
        return self.proj_out(h) + res


class TorchTimestepEmbedding(tnn.Module):
    def __init__(self, dim, emb_dim):
        super().__init__()
        self.linear_1 = tnn.Linear(dim, emb_dim)
        self.linear_2 = tnn.Linear(emb_dim, emb_dim)

    def forward(self, t_emb):
        return self.linear_2(tnn.functional.silu(self.linear_1(t_emb)))


def sinusoidal(timesteps, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    emb = torch.exp(exponent / half)[None] * timesteps.float()[:, None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TorchTemporalBlock(tnn.Module):
    """diffusers BasicTransformerBlock with sinusoidal positional
    embeddings and attn2 as SELF-attention (AnimateDiff's
    ("Temporal_Self", "Temporal_Self") pair): norm1 -> +PE -> attn1,
    norm2 -> +PE -> attn2, norm3 -> ff(GEGLU)."""

    def __init__(self, dim, heads, max_len=32):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)
        position = torch.arange(max_len).unsqueeze(1).float()
        div_term = torch.exp(torch.arange(0, dim, 2).float()
                             * (-math.log(10000.0) / dim))
        pe = torch.zeros(1, max_len, dim)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe, persistent=False)

    def forward(self, x):
        _, seq, _ = x.shape
        h = self.norm1(x) + self.pe[:, :seq]
        x = x + self.attn1(h, None)
        h = self.norm2(x) + self.pe[:, :seq]
        x = x + self.attn2(h, None)
        return x + self.ff(self.norm3(x))


class TorchMotionModule(tnn.Module):
    """diffusers TransformerTemporalModel: GN(32, eps 1e-6) on
    (B, C, T, H, W) -> token-major (B*H*W, T, C) -> proj_in ->
    temporal transformer block -> proj_out, +residual."""

    def __init__(self, dim, heads=HEADS):
        super().__init__()
        self.norm = tnn.GroupNorm(gn_groups(dim), dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList(
            [TorchTemporalBlock(dim, heads)])
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, num_frames):
        bt, c, hh, ww = x.shape
        b = bt // num_frames
        res = x
        h = x.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        h = self.norm(h)  # stats pool over (C/G, T, H, W) per clip
        h = h.permute(0, 3, 4, 2, 1).reshape(b * hh * ww, num_frames, c)
        h = self.proj_in(h)
        h = self.transformer_blocks[0](h)
        h = self.proj_out(h)
        h = h.reshape(b, hh, ww, num_frames, c).permute(0, 3, 4, 1, 2)
        return h.reshape(bt, c, hh, ww) + res


class _Blocks(tnn.Module):
    """Shared down/mid/up trunk used by both the UNet and BrushNet
    oracles (BrushNet is architecturally a UNet clone). motion=True adds
    UNetMotionModel's AnimateDiff motion modules: one after EVERY
    resnet(+attention) in all down/up blocks (incl. the attention-free
    ones) plus one in the mid block."""

    def __init__(self, in_channels, motion=False):
        super().__init__()
        self.motion = motion
        self.conv_in = tnn.Conv2d(in_channels, CH[0], 3, padding=1)
        self.time_embedding = TorchTimestepEmbedding(CH[0], TEMB)
        self.down_blocks = tnn.ModuleList()
        prev = CH[0]
        for i, c in enumerate(CH):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TorchResnetBlock(prev if j == 0 else c, c, TEMB,
                                  gn_groups(c)) for j in range(LAYERS)])
            if i < len(CH) - 1:
                blk.attentions = tnn.ModuleList(
                    [TorchTransformer2D(c, HEADS, CTX) for _ in range(LAYERS)])
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([ds])
            if motion:
                blk.motion_modules = tnn.ModuleList(
                    [TorchMotionModule(c) for _ in range(LAYERS)])
            self.down_blocks.append(blk)
            prev = c
        self.mid_block = tnn.Module()
        self.mid_block.resnets = tnn.ModuleList(
            [TorchResnetBlock(CH[-1], CH[-1], TEMB, gn_groups(CH[-1]))
             for _ in range(2)])
        self.mid_block.attentions = tnn.ModuleList(
            [TorchTransformer2D(CH[-1], HEADS, CTX)])
        if motion:
            self.mid_block.motion_modules = tnn.ModuleList(
                [TorchMotionModule(CH[-1])])
        rev = tuple(reversed(CH))
        self.up_blocks = tnn.ModuleList()
        skip_chs = [CH[0]]
        for i, c in enumerate(CH):
            skip_chs += [c] * LAYERS
            if i < len(CH) - 1:
                skip_chs.append(c)
        prev = CH[-1]
        for i, c in enumerate(rev):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList()
            for j in range(LAYERS + 1):
                skip = skip_chs.pop()
                blk.resnets.append(
                    TorchResnetBlock(prev + skip, c, TEMB, gn_groups(c)))
                prev = c
            if i > 0:
                blk.attentions = tnn.ModuleList(
                    [TorchTransformer2D(c, HEADS, CTX)
                     for _ in range(LAYERS + 1)])
            if i < len(CH) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            if motion:
                blk.motion_modules = tnn.ModuleList(
                    [TorchMotionModule(c) for _ in range(LAYERS + 1)])
            self.up_blocks.append(blk)

    def run(self, sample, timesteps, ctx, taps=None, inject=None,
            num_frames=1):
        """taps: dict to receive {"down": [...], "mid": t, "up": [...]}
        feature taps (BrushNet mode); inject: same-structure dict of
        features to ADD at those points (UNet mode). BrushNet adds land
        AFTER the motion module (resnet -> attn -> motion -> +add)."""
        temb = self.time_embedding(sinusoidal(timesteps, CH[0]))
        h = self.conv_in(sample)
        down_in = list(inject["down"]) if inject else None
        up_in = list(inject["up"]) if inject else None
        down_taps, up_taps = [], []

        if down_in:
            h = h + down_in.pop(0)
        down_taps.append(h)
        down_res = [h]
        for i, blk in enumerate(self.down_blocks):
            for j in range(LAYERS):
                h = blk.resnets[j](h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                if self.motion:
                    h = blk.motion_modules[j](h, num_frames)
                if down_in:
                    h = h + down_in.pop(0)
                down_taps.append(h)
                down_res.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                if down_in:
                    h = h + down_in.pop(0)
                down_taps.append(h)
                down_res.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        if self.motion:
            h = self.mid_block.motion_modules[0](h, num_frames)
        h = self.mid_block.resnets[1](h, temb)
        if inject is not None:
            h = h + inject["mid"]
        mid_tap = h
        for i, blk in enumerate(self.up_blocks):
            for j in range(LAYERS + 1):
                skip = down_res.pop()
                h = torch.cat([h, skip], dim=1)
                h = blk.resnets[j](h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                if self.motion:
                    h = blk.motion_modules[j](h, num_frames)
                if up_in:
                    h = h + up_in.pop(0)
                up_taps.append(h)
            if hasattr(blk, "upsamplers"):
                target = down_res[-1].shape[-2:]
                h = tnn.functional.interpolate(h, size=target, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        if taps is not None:
            taps.update(down=down_taps, mid=mid_tap, up=up_taps)
        return h


class TorchUNet(_Blocks):
    def __init__(self, motion=False):
        super().__init__(4, motion=motion)
        self.conv_norm_out = tnn.GroupNorm(gn_groups(CH[0]), CH[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(CH[0], 4, 3, padding=1)

    def forward(self, sample, t, ctx, inject=None, num_frames=1):
        h = self.run(sample, t, ctx, inject=inject, num_frames=num_frames)
        return self.conv_out(tnn.functional.silu(self.conv_norm_out(h)))


def _down_tap_channels():
    chs = [CH[0]]
    for i, c in enumerate(CH):
        chs += [c] * LAYERS
        if i < len(CH) - 1:
            chs.append(c)
    return chs


class TorchBrushNet(_Blocks):
    def __init__(self):
        super().__init__(9)
        # zero convs intentionally random here (zeros would hide wiring
        # bugs); named like diffusers BrushNetModel
        self.brushnet_down_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, c, 1) for c in _down_tap_channels()])
        self.brushnet_mid_block = tnn.Conv2d(CH[-1], CH[-1], 1)
        rev = tuple(reversed(CH))
        self.brushnet_up_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, c, 1) for c in rev for _ in range(LAYERS + 1)])

    def forward(self, sample, t, ctx):
        taps = {}
        self.run(sample, t, ctx, taps=taps)
        down = [self.brushnet_down_blocks[i](f)
                for i, f in enumerate(taps["down"])]
        up = [self.brushnet_up_blocks[i](f)
              for i, f in enumerate(taps["up"])]
        return down, self.brushnet_mid_block(taps["mid"]), up


def _convert(tm):
    state = {k: v for k, v in tm.state_dict().items()}
    return convert_state_dict(state, UNET_RULES, UNET_SPECIALS)


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    tu = TorchUNet().eval()
    tb = TorchBrushNet().eval()
    rng = np.random.default_rng(0)
    B, H, W = 2, 16, 16
    x = rng.standard_normal((B, 4, H, W)).astype(np.float32)
    bsamp = rng.standard_normal((B, 9, H, W)).astype(np.float32)
    ctx = rng.standard_normal((B, 5, CTX)).astype(np.float32)
    t = torch.tensor([3, 500])
    return tu, tb, x, bsamp, ctx, t


class TestFullUNetOracle:
    def test_unet_matches(self, oracle):
        from videovanish_tpu.models.diffueraser.unet import UNetCondition
        tu, tb, x, bsamp, ctx, t = oracle
        with torch.no_grad():
            ref = _nhwc(tu(torch.from_numpy(x), t, torch.from_numpy(ctx)))
        m = UNetCondition(in_channels=4, out_channels=4,
                          block_out_channels=CH, layers_per_block=LAYERS,
                          num_attention_heads=HEADS, cross_attention_dim=CTX)
        out = m.apply({"params": _convert(tu)},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jnp.asarray(t.numpy()), jnp.asarray(ctx), 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def test_unet_with_brushnet_matches(self, oracle):
        from videovanish_tpu.models.diffueraser.brushnet import BrushNetModel
        from videovanish_tpu.models.diffueraser.unet import UNetCondition
        tu, tb, x, bsamp, ctx, t = oracle
        with torch.no_grad():
            down, mid, up = tb(torch.from_numpy(bsamp), t,
                               torch.from_numpy(ctx))
            inject = {"down": down, "mid": mid, "up": up}
            ref = _nhwc(tu(torch.from_numpy(x), t, torch.from_numpy(ctx),
                           inject=inject))

        bm = BrushNetModel(in_channels=9, block_out_channels=CH,
                           layers_per_block=LAYERS,
                           num_attention_heads=HEADS)
        bd, bmid, bu = bm.apply({"params": _convert(tb)},
                                jnp.asarray(np.transpose(bsamp, (0, 2, 3, 1))),
                                jnp.asarray(t.numpy()), jnp.asarray(ctx), 1)
        # branch features themselves must match first
        for i, f in enumerate(down):
            np.testing.assert_allclose(np.asarray(bd[i]), _nhwc(f),
                                       atol=1e-4, err_msg=f"down[{i}]")
        np.testing.assert_allclose(np.asarray(bmid), _nhwc(mid), atol=1e-4)
        for i, f in enumerate(up):
            np.testing.assert_allclose(np.asarray(bu[i]), _nhwc(f),
                                       atol=1e-4, err_msg=f"up[{i}]")

        m = UNetCondition(in_channels=4, out_channels=4,
                          block_out_channels=CH, layers_per_block=LAYERS,
                          num_attention_heads=HEADS, cross_attention_dim=CTX)
        out = m.apply({"params": _convert(tu)},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jnp.asarray(t.numpy()), jnp.asarray(ctx), 1,
                      brushnet_down=bd, brushnet_mid=bmid, brushnet_up=bu)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


class TestMotionUNetOracle:
    """Temporal composition gate: UNetMotionModel-placement motion
    modules (21 for SD1.5: after every resnet in all down/up blocks +
    mid) at t_frames > 1, with frame-wise BrushNet injection — the
    ordering (resnet -> attn -> motion -> +brushnet add) is what the
    real unet_main + brushnet checkpoints expect."""

    def test_temporal_with_brushnet_matches(self):
        from videovanish_tpu.models.diffueraser.brushnet import BrushNetModel
        from videovanish_tpu.models.diffueraser.unet import UNetCondition
        torch.manual_seed(7)
        tu = TorchUNet(motion=True).eval()
        tb = TorchBrushNet().eval()
        rng = np.random.default_rng(7)
        B, T, H, W = 1, 4, 16, 16
        x = rng.standard_normal((B * T, 4, H, W)).astype(np.float32)
        bsamp = rng.standard_normal((B * T, 9, H, W)).astype(np.float32)
        ctx = rng.standard_normal((B * T, 5, CTX)).astype(np.float32)
        t = torch.tensor([11] * (B * T))
        with torch.no_grad():
            down, mid, up = tb(torch.from_numpy(bsamp), t,
                               torch.from_numpy(ctx))
            inject = {"down": down, "mid": mid, "up": up}
            ref = _nhwc(tu(torch.from_numpy(x), t, torch.from_numpy(ctx),
                           inject=inject, num_frames=T))

        bm = BrushNetModel(in_channels=9, block_out_channels=CH,
                           layers_per_block=LAYERS,
                           num_attention_heads=HEADS)
        bd, bmid, bu = bm.apply({"params": _convert(tb)},
                                jnp.asarray(np.transpose(bsamp, (0, 2, 3, 1))),
                                jnp.asarray(t.numpy()), jnp.asarray(ctx), T)
        m = UNetCondition(in_channels=4, out_channels=4,
                          block_out_channels=CH, layers_per_block=LAYERS,
                          num_attention_heads=HEADS, cross_attention_dim=CTX)
        out = m.apply({"params": _convert(tu)},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jnp.asarray(t.numpy()), jnp.asarray(ctx), T,
                      brushnet_down=bd, brushnet_mid=bmid, brushnet_up=bu)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)

    def test_motion_param_inventory(self):
        """Every torch motion-module tensor lands in our tree, and our
        temporal init creates NO param the checkpoint would not fill."""
        import jax
        from videovanish_tpu.models.diffueraser.unet import UNetCondition
        torch.manual_seed(0)
        tu = TorchUNet(motion=True)
        converted = _convert(tu)
        m = UNetCondition(in_channels=4, out_channels=4,
                          block_out_channels=CH, layers_per_block=LAYERS,
                          num_attention_heads=HEADS, cross_attention_dim=CTX)
        init = jax.eval_shape(
            lambda k: m.init(k, jnp.zeros((2, 16, 16, 4)),
                             jnp.zeros((2,), jnp.int32),
                             jnp.zeros((2, 5, CTX)), 2),
            jax.random.PRNGKey(0))["params"]

        def paths(tree):
            out = set()
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                out.add(("/".join(str(getattr(k, "key", k)) for k in kp),
                         tuple(leaf.shape)))
            return out
        assert paths(converted) == paths(init)
