"""fb-format SAM2 conversion validation (VERDICT r1 item 7).

The reference loads facebookresearch-format `sam2.1_hiera_large.pt`
(/root/reference/sam2_masker.py:19-20). No fb checkpoint exists on this
zero-egress host, so the gate works by construction: take the
END-TO-END-VALIDATED transformers Sam2VideoModel oracle (test_parity.py
proves HF_SAM2_RULES produce a tree whose propagation matches the
official model bit-for-bit), rewrite its state dict into the official
fb key layout (the published sam2 repo module tree — prefix renames,
point-embedding split, Sequential indices for upscaling / mask
downsampler, CXBlock short names, top-level buffer names), and require
SAM2_RULES + sam2_fb_preprocess to produce the IDENTICAL tree.

If either rule set misroutes, drops, or mis-transposes any leaf of the
full video model, the trees differ.
"""
import re

import numpy as np
import pytest
import torch

from videovanish_tpu.core.convert import (
    HF_SAM2_RULES, SAM2_RULES, SAM2_SPECIALS, convert_state_dict,
    sam2_fb_preprocess,
)

# HF key -> fb key rewrites, applied in order (first match wins for the
# prefix rules; all are substitutions). This encodes the official fb
# module tree relative to the HF one.
HF_TO_FB = [
    # drops: HF-only tied/buffer keys
    (r"^shared_image_embedding\.", None),
    (r"^mask_downsample\.", None),
    # prompt-encoder mask path: HF mask_embed module -> fb Sequential
    # sam_prompt_encoder.mask_downscaling.{0,1,3,4,6} (conv, LN, conv,
    # LN, conv — validated against the frozen production manifest)
    (r"^prompt_encoder\.mask_embed\.conv1\.",
     "sam_prompt_encoder.mask_downscaling.0."),
    (r"^prompt_encoder\.mask_embed\.layer_norm1\.",
     "sam_prompt_encoder.mask_downscaling.1."),
    (r"^prompt_encoder\.mask_embed\.conv2\.",
     "sam_prompt_encoder.mask_downscaling.3."),
    (r"^prompt_encoder\.mask_embed\.layer_norm2\.",
     "sam_prompt_encoder.mask_downscaling.4."),
    (r"^prompt_encoder\.mask_embed\.conv3\.",
     "sam_prompt_encoder.mask_downscaling.6."),
    (r"^no_memory_positional_encoding$", "no_mem_pos_enc"),
    # component prefixes
    (r"^vision_encoder\.backbone\.", "image_encoder.trunk."),
    (r"^vision_encoder\.neck\.", "image_encoder.neck."),
    # fb nests each FPN lateral conv one level deeper
    (r"^image_encoder\.neck\.convs\.(\d+)\.",
     r"image_encoder.neck.convs.\1.conv."),
    (r"^mask_decoder\.", "sam_mask_decoder."),
    (r"^prompt_encoder\.", "sam_prompt_encoder."),
    (r"^object_pointer_proj\.", "obj_ptr_proj."),
    (r"^temporal_positional_encoding_projection_layer\.",
     "obj_ptr_tpos_proj."),
    # top-level names
    (r"^no_memory_embedding$", "no_mem_embed"),
    (r"^no_object_pointer$", "no_obj_ptr"),
    (r"^occlusion_spatial_embedding_parameter$", "no_obj_embed_spatial"),
    (r"^memory_temporal_positional_encoding$", "maskmem_tpos_enc"),
    (r"^memory_attention\.layer_norm\.", "memory_attention.norm."),
    # hiera
    (r"patch_embed\.projection\.", "patch_embed.proj."),
    (r"\.layer_norm1\.", ".norm1."),
    (r"\.layer_norm2\.", ".norm2."),
    (r"\.layer_norm3\.", ".norm3."),
    (r"\.layer_norm4\.", ".norm4."),
    # decoder two-way transformer
    (r"(transformer\.layers\.\d+)\.mlp\.proj_in\.", r"\1.mlp.lin1."),
    (r"(transformer\.layers\.\d+)\.mlp\.proj_out\.", r"\1.mlp.lin2."),
    (r"\.o_proj\.", ".out_proj."),
    (r"\.layer_norm_final_attn\.", ".norm_final_attn."),
    # 3-layer MLP heads: HF proj_in/layers.0/proj_out -> fb layers.0/1/2
    (r"(iou_prediction_head|pred_obj_score_head|obj_ptr_proj|"
     r"output_hypernetworks_mlps\.\d+)\.layers\.0\.", r"\1.layers.1."),
    (r"(iou_prediction_head|pred_obj_score_head|obj_ptr_proj|"
     r"output_hypernetworks_mlps\.\d+)\.proj_in\.", r"\1.layers.0."),
    (r"(iou_prediction_head|pred_obj_score_head|obj_ptr_proj|"
     r"output_hypernetworks_mlps\.\d+)\.proj_out\.", r"\1.layers.2."),
    # decoder upscaling / skips
    (r"\.upscale_conv1\.", ".output_upscaling.0."),
    (r"\.upscale_layer_norm\.", ".output_upscaling.1."),
    (r"\.upscale_conv2\.", ".output_upscaling.3."),
    # prompt encoder
    (r"^sam_prompt_encoder\.shared_embedding\.positional_embedding$",
     "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    # hiera / memory-attention generic MLP names
    (r"\.mlp\.proj_in\.", ".mlp.layers.0."),
    (r"\.mlp\.proj_out\.", ".mlp.layers.1."),
    # memory encoder
    (r"memory_encoder\.feature_projection\.", "memory_encoder.pix_feat_proj."),
    (r"memory_encoder\.projection\.", "memory_encoder.out_proj."),
    (r"memory_fuser\.layers\.(\d+)\.", r"fuser.layers.\1."),
    (r"(fuser\.layers\.\d+)\.scale$", r"\1.gamma"),
    (r"\.depthwise_conv\.", ".dwconv."),
    (r"\.pointwise_conv([12])\.", r".pwconv\1."),
    (r"(fuser\.layers\.\d+)\.layer_norm\.", r"\1.norm."),
    (r"mask_downsampler\.final_conv\.", "mask_downsampler.encoder.12."),
    (r"mask_downsampler\.layers\.(\d+)\.conv\.",
     lambda m: f"mask_downsampler.encoder.{3 * int(m.group(1))}."),
    (r"mask_downsampler\.layers\.(\d+)\.layer_norm\.",
     lambda m: f"mask_downsampler.encoder.{3 * int(m.group(1)) + 1}."),
]


def hf_to_fb_state(state):
    fb = {}
    for k, v in state.items():
        dropped = False
        for pat, rep in HF_TO_FB:
            if re.search(pat, k):
                if rep is None:
                    dropped = True
                    break
                k = re.sub(pat, rep, k)
        if dropped:
            continue
        if k == "sam_prompt_encoder.point_embed.weight":
            # fb stores 4 separate (1, C) embeddings
            for i in range(v.shape[0]):
                fb[f"sam_prompt_encoder.point_embeddings.{i}.weight"] = \
                    v[i:i + 1]
            continue
        fb[k] = v
    return fb


@pytest.fixture(scope="module")
def tiny_hf_video_model():
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig, Sam2VisionConfig,
    )
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoConfig, Sam2VideoMaskDecoderConfig,
        Sam2VideoPromptEncoderConfig,
    )
    from transformers.models.sam2_video.modeling_sam2_video import (
        Sam2VideoModel,
    )
    bb = Sam2HieraDetConfig(
        hidden_size=32, blocks_per_stage=[1, 2, 2, 1],
        embed_dim_per_stage=[32, 64, 128, 256],
        num_attention_heads_per_stage=[1, 2, 4, 8],
        window_size_per_stage=[8, 4, 14, 7],
        global_attention_blocks=[4], image_size=[128, 128])
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
        image_size=128, num_maskmem=7, max_object_pointers_in_encoder=4,
        memory_attention_hidden_size=128, memory_attention_num_layers=2,
        memory_attention_feed_forward_hidden_size=2048,
        memory_attention_rope_feat_sizes=[8, 8],
        memory_encoder_hidden_size=128, memory_encoder_output_channels=64,
        memory_fuser_embed_dim=128, memory_fuser_intermediate_dim=1024,
        mask_downsampler_embed_dim=128)
    tm = Sam2VideoModel(cfg).eval()
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in tm.parameters():
            p.normal_(0.0, 0.02, generator=gen)
        tm._tie_weights()
    return tm


def _leaves(tree, prefix=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


class TestFbFormatConversion:
    def test_fb_route_equals_validated_hf_route(self, tiny_hf_video_model):
        state = {k: v.numpy() for k, v in
                 tiny_hf_video_model.state_dict().items()}
        via_hf = convert_state_dict(dict(state), HF_SAM2_RULES,
                                    SAM2_SPECIALS)
        fb_state = hf_to_fb_state(state)
        via_fb = convert_state_dict(sam2_fb_preprocess(fb_state),
                                    SAM2_RULES, SAM2_SPECIALS)

        hf_leaves = dict(_leaves(via_hf))
        fb_leaves = dict(_leaves(via_fb))
        missing = set(hf_leaves) - set(fb_leaves)
        extra = set(fb_leaves) - set(hf_leaves)
        assert not missing, f"fb route lost leaves: {sorted(missing)[:8]}"
        assert not extra, f"fb route invented leaves: {sorted(extra)[:8]}"
        for path, hv in hf_leaves.items():
            fv = fb_leaves[path]
            assert hv.shape == fv.shape, (path, hv.shape, fv.shape)
            np.testing.assert_array_equal(hv, fv, err_msg=str(path))

    def test_point_embedding_merge(self):
        state = {f"sam_prompt_encoder.point_embeddings.{i}.weight":
                 np.full((1, 8), float(i), np.float32) for i in range(4)}
        merged = sam2_fb_preprocess(state)
        assert list(merged) == ["sam_prompt_encoder.point_embeddings"]
        tbl = merged["sam_prompt_encoder.point_embeddings"]
        assert tbl.shape == (4, 8)
        np.testing.assert_array_equal(tbl[:, 0], [0, 1, 2, 3])


def _production_hf_meta_state():
    """Key inventory (names + shapes) of the PRODUCTION-size HF
    Sam2VideoModel (facebook/sam2.1-hiera-large architecture — the
    reference's actual SAM2 artifact, sam2_masker.py:19-20), built on
    the torch meta device so no weights are allocated."""
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig, Sam2VisionConfig,
    )
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoConfig, Sam2VideoMaskDecoderConfig,
        Sam2VideoPromptEncoderConfig,
    )
    from transformers.models.sam2_video.modeling_sam2_video import (
        Sam2VideoModel,
    )
    bb = Sam2HieraDetConfig(
        hidden_size=144, blocks_per_stage=[2, 6, 36, 4],
        embed_dim_per_stage=[144, 288, 576, 1152],
        num_attention_heads_per_stage=[2, 4, 8, 16],
        window_size_per_stage=[8, 4, 16, 8],
        global_attention_blocks=[23, 33, 43], image_size=[1024, 1024])
    vis = Sam2VisionConfig(
        backbone_config=bb, fpn_hidden_size=256,
        backbone_channel_list=[1152, 576, 288, 144],
        backbone_feature_sizes=[[256, 256], [128, 128], [64, 64]])
    cfg = Sam2VideoConfig(
        vision_config=vis,
        prompt_encoder_config=Sam2VideoPromptEncoderConfig(
            hidden_size=256, image_size=1024, patch_size=16),
        mask_decoder_config=Sam2VideoMaskDecoderConfig(
            hidden_size=256, mlp_dim=2048, iou_head_hidden_dim=256),
        image_size=1024, num_maskmem=7, max_object_pointers_in_encoder=16,
        memory_attention_hidden_size=256, memory_attention_num_layers=4,
        memory_attention_feed_forward_hidden_size=2048,
        memory_attention_rope_feat_sizes=[64, 64],
        memory_encoder_hidden_size=256, memory_encoder_output_channels=64,
        memory_fuser_embed_dim=256, memory_fuser_intermediate_dim=1024,
        mask_downsampler_embed_dim=256)
    with torch.device("meta"):
        tm = Sam2VideoModel(cfg)
    return {k: tuple(v.shape) for k, v in tm.state_dict().items()}


class TestFbProductionShapes:
    """VERDICT r3 #6: fb rules rehearsed at PRODUCTION shapes with
    values — the tiny-model test above proves the mapping logic, the
    manifest test (test_convert_manifests.py) proves shapes; this one
    closes the remaining gap (a swapped pair of same-shape leaves or a
    missed transpose passes both)."""

    def test_fb_route_production_values_vs_hf_route(self):
        import json
        import os
        import zlib

        manifest_path = os.path.join(
            os.path.dirname(__file__), "fixtures", "manifests",
            "sam2_1_hiera_large_fb.json")
        with open(manifest_path) as f:
            fb_manifest = {k: tuple(v) for k, v in json.load(f).items()}

        hf_shapes = _production_hf_meta_state()

        def fill(key, shape):
            # distinct, transpose-sensitive values per leaf: a ramp with
            # a key-dependent offset, cheap enough for 224M params
            n = int(np.prod(shape)) if shape else 1
            off = zlib.crc32(key.encode()) % 9973
            return ((np.arange(n, dtype=np.float32) % 251.0) + off) \
                .reshape(shape)

        hf_state = {k: fill(k, s) for k, s in hf_shapes.items()}
        fb_state = hf_to_fb_state(hf_state)

        # the synthesized fb layout must BE the published one: same key
        # inventory, same shapes as the frozen manifest of the real
        # sam2.1_hiera_large.pt
        missing = set(fb_manifest) - set(fb_state)
        extra = set(fb_state) - set(fb_manifest)
        assert not missing, f"synth fb lacks real keys: {sorted(missing)[:8]}"
        assert not extra, f"synth fb invents keys: {sorted(extra)[:8]}"
        bad = [(k, fb_state[k].shape, fb_manifest[k])
               for k in fb_manifest if tuple(fb_state[k].shape) != fb_manifest[k]]
        assert not bad, f"synth fb shape mismatches: {bad[:8]}"

        via_hf = convert_state_dict(hf_state, HF_SAM2_RULES, SAM2_SPECIALS)
        via_fb = convert_state_dict(sam2_fb_preprocess(fb_state),
                                    SAM2_RULES, SAM2_SPECIALS)
        hf_leaves = dict(_leaves(via_hf))
        fb_leaves = dict(_leaves(via_fb))
        assert set(hf_leaves) == set(fb_leaves)
        for path, hv in hf_leaves.items():
            fv = fb_leaves[path]
            assert hv.shape == fv.shape, (path, hv.shape, fv.shape)
            np.testing.assert_array_equal(hv, fv, err_msg=str(path))
