"""Numerical parity harness: our flax modules vs reference torch modules
with CONVERTED weights (SURVEY.md §4 model-test strategy; the PSNR>45dB
end-to-end target stands on these per-module gates).

Each test builds a torch module, exports its state dict with
diffusers-style key names, converts via core/convert.py, applies the
flax module, and gates the difference."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from videovanish_tpu.core.convert import (
    convert_state_dict, flatten_block_indices, t_conv, t_linear,
)


def to_np(t):
    return t.detach().numpy()


class TestNameFlattening:
    @pytest.mark.parametrize("src,dst", [
        ("down_blocks.0.resnets.1.conv1.weight",
         "down_blocks_0.resnets_1.conv1.weight"),
        ("mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight",
         "mid_block.attentions_0.transformer_blocks_0.attn1.to_q.weight"),
        ("up_blocks.3.upsamplers.0.conv.bias",
         "up_blocks_3.upsamplers_0.conv.bias"),
        ("ff.net.0.proj.weight", "ff.net_0.proj.weight"),
    ])
    def test_flatten(self, src, dst):
        assert flatten_block_indices(src) == dst


class TorchResnetBlock(tnn.Module):
    """Reference ResnetBlock2D (public SD architecture) in torch."""

    def __init__(self, cin, cout, temb=32, groups=8):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = tnn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(tnn.functional.silu(temb))[:, :, None, None]
        h = tnn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class TestResnetBlockParity:
    @pytest.mark.parametrize("cin,cout", [(16, 16), (16, 24)])
    def test_parity(self, rng, cin, cout):
        from videovanish_tpu.models.diffueraser.blocks import ResnetBlock2D
        torch.manual_seed(0)
        tm = TorchResnetBlock(cin, cout).eval()
        x = rng.standard_normal((2, 10, 12, cin)).astype(np.float32)
        temb = rng.standard_normal((2, 32)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(temb)).permute(0, 2, 3, 1).numpy()

        state = {k: v for k, v in tm.state_dict().items()}
        params = convert_state_dict(state, [])
        m = ResnetBlock2D(out_channels=cout, groups=8)
        out = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


class TorchTransformerBlock(tnn.Module):
    """Reference BasicTransformerBlock: self-attn, cross-attn, GEGLU FF."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x), None)
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TorchAttention(tnn.Module):
    def __init__(self, dim, heads, kv_dim):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(kv_dim, dim, bias=False)
        self.to_v = tnn.Linear(kv_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx):
        ctx = x if ctx is None else ctx
        B, S, C = x.shape
        h = self.heads
        q = self.to_q(x).view(B, S, h, C // h).transpose(1, 2)
        k = self.to_k(ctx).view(B, -1, h, C // h).transpose(1, 2)
        v = self.to_v(ctx).view(B, -1, h, C // h).transpose(1, 2)
        o = tnn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(B, S, C)
        return self.to_out[0](o)


class TorchFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList([
            TorchGEGLU(dim, dim * mult), tnn.Identity(),
            tnn.Linear(dim * mult, dim),
        ])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchGEGLU(tnn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = tnn.Linear(din, dout * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * tnn.functional.gelu(gate)


class TestTransformerBlockParity:
    def test_parity(self, rng):
        from videovanish_tpu.models.diffueraser.blocks import (
            BasicTransformerBlock,
        )
        torch.manual_seed(1)
        dim, heads, ctx_dim = 32, 4, 24
        tm = TorchTransformerBlock(dim, heads, ctx_dim).eval()
        x = rng.standard_normal((2, 9, dim)).astype(np.float32)
        ctx = rng.standard_normal((2, 5, ctx_dim)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()

        state = tm.state_dict()
        params = convert_state_dict(state, [(r"\.to_out\.0\.", ".to_out_0.")])
        m = BasicTransformerBlock(num_heads=heads, head_dim=dim // heads)
        out = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


class TestLayoutTransforms:
    def test_conv_layout(self, rng):
        w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
        x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
        ref = tnn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
            padding=1).permute(0, 2, 3, 1).numpy()
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(t_conv(w)), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_linear_layout(self, rng):
        w = rng.standard_normal((6, 4)).astype(np.float32)
        x = rng.standard_normal((2, 4)).astype(np.float32)
        ref = x @ w.T
        out = x @ t_linear(w)
        np.testing.assert_allclose(out, ref, atol=1e-6)
