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
    (r"^prompt_encoder\.mask_embed\.", None),
    (r"^shared_image_embedding\.", None),
    (r"^no_memory_positional_encoding$", None),
    (r"^mask_downsample\.", None),
    # component prefixes
    (r"^vision_encoder\.backbone\.", "image_encoder.trunk."),
    (r"^vision_encoder\.neck\.", "image_encoder.neck."),
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
