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


class TestSam2HieraParityHF:
    """Our Hiera vs the official SAM2 backbone (transformers ships the
    reference architecture; random weights make it a bit-exact oracle —
    SURVEY.md §2c SAM2 internals)."""

    def test_backbone_matches_hf(self, rng):
        from transformers.models.sam2.configuration_sam2 import (
            Sam2HieraDetConfig,
        )
        from transformers.models.sam2.modeling_sam2 import Sam2HieraDetModel
        from videovanish_tpu.core.convert import HF_SAM2_RULES, SAM2_SPECIALS
        from videovanish_tpu.models.sam2.hiera import Hiera

        cfg = Sam2HieraDetConfig(
            hidden_size=32, blocks_per_stage=[1, 2, 2, 1],
            embed_dim_per_stage=[32, 64, 128, 256],
            num_attention_heads_per_stage=[1, 2, 4, 8],
            window_size_per_stage=[8, 4, 14, 7],
            global_attention_blocks=[4], image_size=[128, 128])
        tm = Sam2HieraDetModel(cfg).eval()
        gen = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in tm.parameters():
                p.normal_(0.0, 0.02, generator=gen)

        x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        refs = [r.numpy() for r in ref.intermediate_hidden_states]

        params = convert_state_dict(
            {k: to_np(v) for k, v in tm.state_dict().items()},
            HF_SAM2_RULES, special=SAM2_SPECIALS)
        m = Hiera(embed_dim=32, num_heads=1, stages=(1, 2, 2, 1),
                  window_spec=(8, 4, 14, 7), global_att_blocks=(4,),
                  pos_embed_bkg_size=(7, 7), pos_embed_window_size=8)
        outs = m.apply({"params": params}, jnp.asarray(x))
        assert len(outs) == len(refs)
        for i, (o, r) in enumerate(zip(outs, refs)):
            assert o.shape == r.shape, (i, o.shape, r.shape)
            np.testing.assert_allclose(np.asarray(o), r, atol=2e-4,
                                       err_msg=f"stage {i}")

    def test_vision_encoder_with_neck_matches_hf(self, rng):
        from transformers.models.sam2.configuration_sam2 import (
            Sam2HieraDetConfig, Sam2VisionConfig,
        )
        from transformers.models.sam2.modeling_sam2 import Sam2VisionModel
        from videovanish_tpu.core.convert import HF_SAM2_RULES, SAM2_SPECIALS
        from videovanish_tpu.models.sam2.hiera import Hiera
        from videovanish_tpu.models.sam2.neck import FpnNeck

        bb = Sam2HieraDetConfig(
            hidden_size=32, blocks_per_stage=[1, 2, 2, 1],
            embed_dim_per_stage=[32, 64, 128, 256],
            num_attention_heads_per_stage=[1, 2, 4, 8],
            window_size_per_stage=[8, 4, 14, 7],
            global_attention_blocks=[4], image_size=[128, 128])
        cfg = Sam2VisionConfig(
            backbone_config=bb, fpn_hidden_size=64,
            backbone_channel_list=[256, 128, 64, 32])
        tm = Sam2VisionModel(cfg).eval()
        gen = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in tm.parameters():
                p.normal_(0.0, 0.02, generator=gen)

        x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        # HF returns the last num_feature_levels (3) FPN levels reversed:
        # [stride4, stride8, stride16], channel-first
        ref_feats = [r.permute(0, 2, 3, 1).numpy()
                     for r in ref.fpn_hidden_states]
        ref_pos = [r.permute(0, 2, 3, 1).numpy()
                   for r in ref.fpn_position_encoding]

        params = convert_state_dict(
            {k: to_np(v) for k, v in tm.state_dict().items()},
            HF_SAM2_RULES, special=SAM2_SPECIALS)
        hiera = Hiera(embed_dim=32, num_heads=1, stages=(1, 2, 2, 1),
                      window_spec=(8, 4, 14, 7), global_att_blocks=(4,),
                      pos_embed_bkg_size=(7, 7), pos_embed_window_size=8)
        neck = FpnNeck(d_model=64)
        feats = hiera.apply({"params": params["hiera"]}, jnp.asarray(x))
        outs, pos = neck.apply({"params": params["neck"]}, feats)
        for i in range(3):
            np.testing.assert_allclose(np.asarray(outs[i]), ref_feats[i],
                                       atol=2e-4, err_msg=f"feat {i}")
            np.testing.assert_allclose(np.asarray(pos[i])[None], ref_pos[i],
                                       atol=1e-5, err_msg=f"pos {i}")


class TestSam2ImagePipelineParityHF:
    """Full single-image SAM2 path (Hiera -> FPN -> prompt encoder ->
    mask decoder) vs transformers' Sam2Model with converted random
    weights — the architecture oracle for the reference's
    sam2.1_hiera_large checkpoint family."""

    def _tiny_hf_model(self):
        from transformers.models.sam2.configuration_sam2 import (
            Sam2Config, Sam2HieraDetConfig, Sam2MaskDecoderConfig,
            Sam2PromptEncoderConfig, Sam2VisionConfig,
        )
        from transformers.models.sam2.modeling_sam2 import Sam2Model
        bb = Sam2HieraDetConfig(
            hidden_size=32, blocks_per_stage=[1, 2, 2, 1],
            embed_dim_per_stage=[32, 64, 128, 256],
            num_attention_heads_per_stage=[1, 2, 4, 8],
            window_size_per_stage=[8, 4, 14, 7],
            global_attention_blocks=[4], image_size=[128, 128])
        vis = Sam2VisionConfig(
            backbone_config=bb, fpn_hidden_size=64,
            backbone_channel_list=[256, 128, 64, 32],
            backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]])
        cfg = Sam2Config(
            vision_config=vis,
            prompt_encoder_config=Sam2PromptEncoderConfig(
                hidden_size=64, image_size=128, patch_size=16),
            mask_decoder_config=Sam2MaskDecoderConfig(
                hidden_size=64, mlp_dim=512, iou_head_hidden_dim=64))
        m = Sam2Model(cfg).eval()
        gen = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in m.parameters():
                p.normal_(0.0, 0.02, generator=gen)
            # image-only pipeline: the video no-memory embedding is out of
            # scope here (predictor-level); zero it on the oracle
            m.no_memory_embedding.zero_()
            m._tie_weights()
        return m

    def test_point_prompted_masks_match_hf(self, rng):
        from videovanish_tpu.core.convert import HF_SAM2_RULES, SAM2_SPECIALS
        from videovanish_tpu.models.sam2.decoder import MaskDecoder
        from videovanish_tpu.models.sam2.hiera import Hiera
        from videovanish_tpu.models.sam2.neck import FpnNeck
        from videovanish_tpu.models.sam2.prompt import MAX_POINTS, PromptEncoder

        tm = self._tiny_hf_model()
        img = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        pts = np.array([[[[40.0, 60.0], [90.0, 30.0]]]], np.float32)  # (1,1,2,2)
        labs = np.array([[[1, 0]]], np.int64)
        with torch.no_grad():
            ref = tm(pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2),
                     input_points=torch.from_numpy(pts),
                     input_labels=torch.from_numpy(labs),
                     multimask_output=True)
        ref_masks = ref.pred_masks[:, 0].numpy()      # (1, 3, 32, 32)
        ref_iou = ref.iou_scores[:, 0].numpy()        # (1, 3)

        params = convert_state_dict(
            {k: to_np(v) for k, v in tm.state_dict().items()},
            HF_SAM2_RULES, special=SAM2_SPECIALS)

        hiera = Hiera(embed_dim=32, num_heads=1, stages=(1, 2, 2, 1),
                      window_spec=(8, 4, 14, 7), global_att_blocks=(4,),
                      pos_embed_bkg_size=(7, 7), pos_embed_window_size=8)
        neck = FpnNeck(d_model=64)
        penc = PromptEncoder(embed_dim=64, image_size=128)
        dec = MaskDecoder(embed_dim=64)

        feats = hiera.apply({"params": params["hiera"]}, jnp.asarray(img))
        fpn, _ = neck.apply({"params": params["neck"]}, feats)
        f4, f8, f16 = fpn[0], fpn[1], fpn[2]

        points = np.zeros((1, MAX_POINTS, 2), np.float32)
        labels = np.full((1, MAX_POINTS), -1, np.int32)
        points[0, :2] = pts[0, 0]
        labels[0, :2] = labs[0, 0]
        sparse, no_mask = penc.apply({"params": params["prompt_encoder"]},
                                     jnp.asarray(points), jnp.asarray(labels))
        dense_pe = penc.apply({"params": params["prompt_encoder"]}, 8, 8,
                              method=penc.dense_pe)
        real = jnp.asarray(labels) >= 0
        pad_rank = jnp.cumsum((~real).astype(jnp.int32), axis=1)
        sparse_valid = real | ((pad_rank == 1) & ~real)

        # obj_ptr_proj lives in the VIDEO model (object_pointer_proj);
        # the image-model oracle has no weights for it — keep init values
        # for that head only (its output is not compared here)
        dec_init = dec.init(
            jax.random.PRNGKey(0), f16, dense_pe[None], sparse, f4, f8,
            sparse_valid=sparse_valid)["params"]

        def merge(dst, src):
            for k, v in src.items():
                dst[k] = merge(dict(dst.get(k, {})), v) \
                    if isinstance(v, dict) else v
            return dst

        dec_params = merge(dict(dec_init), params["decoder"])
        out = dec.apply({"params": dec_params},
                        f16 + no_mask[None, None, None], dense_pe[None],
                        sparse, f4, f8, sparse_valid=sparse_valid)
        ours_masks = np.asarray(out["masks"])[:, 1:4]
        ours_iou = np.asarray(out["iou"])[:, 1:4]
        np.testing.assert_allclose(ours_masks, ref_masks, atol=1e-3)
        np.testing.assert_allclose(ours_iou, ref_iou, atol=1e-4)


class TestSam2MemoryParityHF:
    """Memory attention + memory encoder vs the official video model
    modules (transformers Sam2Video oracle)."""

    def _video_config(self):
        from transformers.models.sam2_video.configuration_sam2_video import (
            Sam2VideoConfig,
        )
        cfg = Sam2VideoConfig(
            memory_attention_hidden_size=64,
            memory_attention_num_layers=2,
            memory_attention_feed_forward_hidden_size=128,
            memory_attention_rope_feat_sizes=[4, 4],
            memory_encoder_hidden_size=64,
            memory_encoder_output_channels=16,
            memory_fuser_embed_dim=64,
            memory_fuser_intermediate_dim=256,
            mask_downsampler_embed_dim=64,
        )
        cfg._attn_implementation = "eager"  # standalone module use
        return cfg

    def test_memory_attention_matches_hf(self, rng):
        from transformers.models.sam2_video.modeling_sam2_video import (
            Sam2VideoMemoryAttention,
        )
        from videovanish_tpu.core.convert import HF_SAM2_RULES, SAM2_SPECIALS
        from videovanish_tpu.models.sam2.memory import MemoryAttention

        cfg = self._video_config()
        tm = Sam2VideoMemoryAttention(cfg).eval()
        gen = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in tm.parameters():
                p.normal_(0.0, 0.02, generator=gen)

        S, mem_dim = 16, 64  # 4x4 grid; kv_in = 64
        n_spatial, n_ptr = 2 * S, 6
        M = n_spatial + n_ptr
        x = rng.standard_normal((S, 1, 64)).astype(np.float32)   # seq-first
        x_pos = rng.standard_normal((S, 1, 64)).astype(np.float32)
        mem = rng.standard_normal((M, 1, mem_dim)).astype(np.float32)
        mem_pos = rng.standard_normal((M, 1, mem_dim)).astype(np.float32)
        with torch.no_grad():
            ref = tm(
                current_vision_features=torch.from_numpy(x),
                current_vision_position_embeddings=torch.from_numpy(x_pos),
                memory=torch.from_numpy(mem),
                memory_posision_embeddings=torch.from_numpy(mem_pos),
                num_object_pointer_tokens=n_ptr,
            )
        ref = ref.reshape(S, 1, 64).permute(1, 0, 2).numpy()  # (1, S, 64)

        params = convert_state_dict(
            {("memory_attention." + k): to_np(v)
             for k, v in tm.state_dict().items()},
            HF_SAM2_RULES, special=SAM2_SPECIALS)["memory_attention"]
        m = MemoryAttention(num_layers=2, d_model=64, kv_dim=mem_dim, mlp_dim=128)
        # official cross-attn reads memory at kv_in_dim=64: the config
        # hardcodes kv_in 64 == our mem_dim here
        out = m.apply({"params": params},
                      jnp.asarray(x.transpose(1, 0, 2)),
                      jnp.asarray(x_pos.transpose(1, 0, 2)),
                      jnp.asarray(mem.transpose(1, 0, 2)),
                      jnp.asarray(mem_pos.transpose(1, 0, 2)),
                      jnp.ones((1, M), bool))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def test_memory_encoder_matches_hf(self, rng):
        from transformers.models.sam2_video.modeling_sam2_video import (
            Sam2VideoMemoryEncoder,
        )
        from videovanish_tpu.core.convert import HF_SAM2_RULES, SAM2_SPECIALS
        from videovanish_tpu.models.sam2.memory import MemoryEncoder

        cfg = self._video_config()
        tm = Sam2VideoMemoryEncoder(cfg).eval()
        gen = torch.Generator().manual_seed(0)
        with torch.no_grad():
            for p in tm.parameters():
                p.normal_(0.0, 0.02, generator=gen)

        pix = rng.standard_normal((1, 4, 4, 64)).astype(np.float32)
        mask = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tm(torch.from_numpy(pix).permute(0, 3, 1, 2),
                        torch.from_numpy(mask).permute(0, 3, 1, 2))
        ref = ref.permute(0, 2, 3, 1).numpy()

        params = convert_state_dict(
            {("memory_encoder." + k): to_np(v)
             for k, v in tm.state_dict().items()},
            HF_SAM2_RULES, special=SAM2_SPECIALS)["memory_encoder"]
        m = MemoryEncoder(d_model=64, mem_dim=16, fuser_intermediate=256)
        out = m.apply({"params": params}, jnp.asarray(pix),
                      jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


class TestSam2VideoEndToEndParityHF:
    """Full streaming video predictor vs transformers Sam2VideoModel:
    prompt on frame 0, propagate through the clip, compare per-frame mask
    logits. Exercises Hiera, neck, prompts, decoder, memory attention,
    memory encoder, temporal/pointer encodings and occlusion handling in
    one pass — the architecture gate for sam2.1 checkpoint fidelity."""

    def test_propagation_matches_hf(self, rng):
        from transformers.models.sam2.configuration_sam2 import (
            Sam2HieraDetConfig,
        )
        from transformers.models.sam2.configuration_sam2 import (
            Sam2VisionConfig,
        )
        from transformers.models.sam2_video.configuration_sam2_video import (
            Sam2VideoConfig, Sam2VideoMaskDecoderConfig,
            Sam2VideoPromptEncoderConfig,
        )
        from transformers.models.sam2_video.modeling_sam2_video import (
            Sam2VideoInferenceSession, Sam2VideoModel,
        )
        from videovanish_tpu.config import Sam2Config
        from videovanish_tpu.core.convert import (
            HF_SAM2_RULES, SAM2_SPECIALS, convert_state_dict,
        )
        from videovanish_tpu.models.sam2.predictor import Sam2VideoPredictor

        bb = Sam2HieraDetConfig(
            hidden_size=32, blocks_per_stage=[1, 2, 2, 1],
            embed_dim_per_stage=[32, 64, 128, 256],
            num_attention_heads_per_stage=[1, 2, 4, 8],
            window_size_per_stage=[8, 4, 14, 7],
            global_attention_blocks=[4], image_size=[128, 128])
        # mem_dim (64, hardcoded in the official cross-attention) must be
        # SMALLER than the hidden size to exercise the pointer-splitting
        # path real checkpoints use, so the tiny oracle runs at hidden 128
        vis = Sam2VisionConfig(
            backbone_config=bb, fpn_hidden_size=128,
            backbone_channel_list=[256, 128, 64, 32],
            backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]])
        cfg = Sam2VideoConfig(
            vision_config=vis,
            prompt_encoder_config=Sam2VideoPromptEncoderConfig(
                hidden_size=128, image_size=128, patch_size=16),
            mask_decoder_config=Sam2VideoMaskDecoderConfig(
                hidden_size=128, mlp_dim=1024, iou_head_hidden_dim=128),
            image_size=128,
            num_maskmem=7,
            max_object_pointers_in_encoder=4,
            memory_attention_hidden_size=128,
            memory_attention_num_layers=2,
            memory_attention_feed_forward_hidden_size=2048,
            memory_attention_rope_feat_sizes=[8, 8],
            memory_encoder_hidden_size=128,
            memory_encoder_output_channels=64,
            memory_fuser_embed_dim=128,
            memory_fuser_intermediate_dim=1024,
            mask_downsampler_embed_dim=128,
        )
        tm = Sam2VideoModel(cfg).eval()
        gen = torch.Generator().manual_seed(3)
        with torch.no_grad():
            for p in tm.parameters():
                p.normal_(0.0, 0.02, generator=gen)
            tm._tie_weights()

        T = 5
        frames_u8 = (rng.random((T, 128, 128, 3)) * 255).astype(np.uint8)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        video = (frames_u8.astype(np.float32) / 255.0 - mean) / std
        video_t = torch.from_numpy(video).permute(0, 3, 1, 2)

        session = Sam2VideoInferenceSession(
            video=video_t, video_height=128, video_width=128,
            dtype=torch.float32)
        obj_idx = session.obj_id_to_idx(1)
        pts = np.array([[[[40.0, 60.0]]]], np.float32)  # (1,1,1,2)
        labs = np.array([[[1]]], np.int64)
        session.add_point_inputs(
            obj_idx, 0, {"point_coords": torch.from_numpy(pts),
                         "point_labels": torch.from_numpy(labs)})
        session.obj_with_new_inputs.append(1)  # the processor's job
        with torch.no_grad():
            tm(inference_session=session, frame_idx=0)
            refs = {}
            for out in tm.propagate_in_video_iterator(
                    session, start_frame_idx=0):
                low = out.pred_masks.float()  # (1, 1, 32, 32)
                hi = torch.nn.functional.interpolate(
                    low, size=(128, 128), mode="bilinear",
                    align_corners=False)
                refs[out.frame_idx] = hi[0, 0].numpy()

        params = convert_state_dict(
            {k: to_np(v) for k, v in tm.state_dict().items()},
            HF_SAM2_RULES, special=SAM2_SPECIALS)
        ours_cfg = Sam2Config(
            image_size=128, hiera_embed_dim=32, hiera_stages=(1, 2, 2, 1),
            hiera_window_spec=(8, 4, 14, 7), hiera_global_att_blocks=(4,),
            backbone_channel_list=(256, 128, 64, 32), neck_d_model=128,
            mem_dim=64, num_maskmem=7, max_obj_ptrs_in_encoder=4,
            memory_attention_layers=2, memory_attention_d_model=128,
            # bit-exact input path for the parity gate; the yuv420 wire's
            # chroma-subsampling delta is gated in tests/test_sam2.py
            wire="rgb")
        pred = Sam2VideoPredictor(config=ours_cfg, params=params)
        state = pred.init_state(list(frames_u8))
        pred.add_new_points_or_box(state, 0, 1,
                                   points=[[40.0, 60.0]], labels=[1])
        got = {}
        for fidx, obj_ids, logits in pred.propagate_in_video(state):
            got[fidx] = logits[0]

        assert set(got) == set(refs)
        for fidx in sorted(refs):
            np.testing.assert_allclose(
                got[fidx], refs[fidx], atol=5e-3,
                err_msg=f"frame {fidx}")
