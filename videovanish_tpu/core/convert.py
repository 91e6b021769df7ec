"""Weight porting: torch/HF checkpoints -> videovanish_tpu orbax pytrees.

The reference downloads torch weights at install/first-run
(install_videovanish.sh:68-70; HF ids diffuerase.py:41-44,49; SAM2 ckpt
sam2_masker.py:19-20). This is the one-time conversion path (SURVEY.md
§2c "checkpoint/weight acquisition"): load a torch/safetensors state
dict on host, remap names, transpose layouts, save with orbax.

Layout transforms (torch -> flax/NHWC):
  conv weight   (O, I, kh, kw) -> (kh, kw, I, O)
  convT weight  (I, O, kh, kw) -> (kh, kw, I, O)  [flax ConvTranspose]
  linear weight (O, I)         -> (I, O)
  norm weight/bias             -> scale/bias (unchanged)

Name mapping is rule-based: our module scope names were chosen to equal
the public diffusers/SAM2 key prefixes with dots flattened to
underscores at the block level, so most keys map mechanically; the
remaining irregulars are explicit rules. Conversion runs entirely on
host (numpy) — no TPU needed.
"""
from __future__ import annotations

import re
from typing import Callable

import numpy as np


# ---------------------------------------------------------------------------
# tensor-level transforms
# ---------------------------------------------------------------------------
def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t_conv_transpose(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d stores (I, O, kh, kw); flax ConvTranspose
    # kernels are (kh, kw, I, O)
    return np.transpose(w, (2, 3, 0, 1))


def t_conv3d(w: np.ndarray) -> np.ndarray:
    # torch Conv3d (O, I, kt, kh, kw) -> flax NDHWC kernel (kt, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def t_identity(w: np.ndarray) -> np.ndarray:
    return w


# ---------------------------------------------------------------------------
# generic name remapping
# ---------------------------------------------------------------------------
_BLOCK_PAT = re.compile(
    r"\b(down_blocks|up_blocks|mid_block|attentions|resnets|motion_modules|"
    r"downsamplers|upsamplers|transformer_blocks|output_hypernetworks_mlps|"
    r"blocks|convs|layers|net)\.(\d+)")


def flatten_block_indices(key: str) -> str:
    """'down_blocks.0.resnets.1.conv1.weight' ->
    'down_blocks_0.resnets_1.conv1.weight' (indices fold into the name)."""
    prev = None
    while prev != key:
        prev = key
        key = _BLOCK_PAT.sub(lambda m: f"{m.group(1)}_{m.group(2)}", key)
    return key


def set_in(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _leaf_transform(torch_key: str, arr: np.ndarray):
    """Decide flax leaf name + layout transform from the torch key/shape."""
    if torch_key.endswith(".bias") or torch_key == "bias":
        return "bias", t_identity
    if not (torch_key.endswith(".weight") or torch_key == "weight"):
        return None, t_identity  # keep the (possibly rule-renamed) leaf
    if arr.ndim == 5:
        return "kernel", t_conv3d
    if arr.ndim == 4:
        return "kernel", t_conv
    if arr.ndim == 2:
        return "kernel", t_linear
    return "scale", t_identity  # 1-D norm weight


def convert_state_dict(state: dict, rules: list[tuple[str, str]],
                       special: list[tuple[str, str, Callable]] = ()) -> dict:
    """Convert a torch state dict into a nested flax params dict.

    rules: ordered (regex, replacement) applied to each dotted key before
    the generic index flattening; a replacement of None drops the key.
    special: (regex on the REMAPPED key, leaf name or None to keep the
    last component, transform) — overrides the generic layout inference
    (e.g. embedding tables are (vocab, width) with no transpose).
    """
    out: dict = {}
    for key, val in state.items():
        arr = np.asarray(val)
        k = key
        dropped = False
        for pat, rep in rules:
            if re.search(pat, k):
                if rep is None:
                    dropped = True
                    break
                k = re.sub(pat, rep, k)
        if dropped:
            continue
        k = flatten_block_indices(k)
        parts = k.split(".")
        for pat, leaf_name, transform in special:
            if re.search(pat, k):
                if leaf_name is not None:
                    parts[-1] = leaf_name
                set_in(out, parts, transform(arr))
                break
        else:
            leaf, transform = _leaf_transform(key, arr)
            if leaf is not None:
                parts[-1] = leaf
            set_in(out, parts, transform(arr))
    return out


# ---------------------------------------------------------------------------
# model-specific rule sets (public diffusers / SAM2 key families)
# ---------------------------------------------------------------------------
# diffusers AutoencoderKL -> models/diffueraser/vae.py naming.
# GroupNorm leaves: our GroupNorm uses scale/bias; torch uses weight/bias.
# The generic _leaf_transform already maps 1-D weight -> scale, so the only
# real VAE irregulars are the attention projections inside the mid block.
VAE_RULES: list[tuple[str, str]] = [
    (r"mid_block\.attentions\.0\.to_out\.0", "mid_block.attentions.0.attn.to_out_0"),
    (r"mid_block\.attentions\.0\.to_(q|k|v)", r"mid_block.attentions.0.attn.to_\1"),
    # pre-0.18-diffusers attention names, as shipped in the published
    # sd-vae-ft-mse file (uploaded 2022; diffusers remaps them on load)
    (r"mid_block\.attentions\.0\.query", "mid_block.attentions.0.attn.to_q"),
    (r"mid_block\.attentions\.0\.key", "mid_block.attentions.0.attn.to_k"),
    (r"mid_block\.attentions\.0\.value", "mid_block.attentions.0.attn.to_v"),
    (r"mid_block\.attentions\.0\.proj_attn",
     "mid_block.attentions.0.attn.to_out_0"),
    (r"mid_block\.attentions\.0\.group_norm", "mid_block.attentions.0.group_norm"),
    # vae.py folds the whole block scope into ONE module name
    # ("up_blocks_0_resnets_1"), same as the UNet
    (r"(down_blocks|up_blocks)\.(\d+)\.(resnets|downsamplers|upsamplers)"
     r"\.(\d+)\.", r"\1_\2_\3_\4."),
]

# diffusers UNet2DConditionModel / BrushNetModel -> models/diffueraser
# naming. Our UNet flattens the block scope into ONE module name
# ("down_blocks_0_resnets_1"), so the block-level dots fold here; inner
# names (conv1, attn1.to_q, ff.net_0.proj ...) match diffusers already.
UNET_RULES: list[tuple[str, str]] = [
    # attention out proj list index
    (r"\.to_out\.0\.", ".to_out_0."),
    # BrushNetModel names its 9-channel input conv `conv_in_condition`
    (r"^conv_in_condition\.", "conv_in."),
    (r"^(down_blocks|up_blocks)\.(\d+)\.(resnets|attentions|motion_modules"
     r"|downsamplers|upsamplers)\.(\d+)\.", r"\1_\2_\3_\4."),
    (r"^mid_block\.(resnets|attentions|motion_modules)\.(\d+)\.",
     r"mid_block_\1_\2."),
    # BrushNet zero convs (diffusers BrushNetModel naming)
    (r"^brushnet_down_blocks\.(\d+)\.", r"zero_down_\1.conv."),
    (r"^brushnet_mid_block\.", "zero_mid.conv."),
    (r"^brushnet_up_blocks\.(\d+)\.", r"zero_up_\1.conv."),
]

# SD1.5 uses use_linear_projection=False: the spatial transformers'
# proj_in/proj_out are 1x1 Conv2d in checkpoints but Dense here (a 1x1
# conv of NHWC IS a matmul — one fewer layout shuffle on TPU).
UNET_SPECIALS: list = [
    (r"(proj_in|proj_out)\.weight$", "kernel",
     lambda a: a[:, :, 0, 0].T if a.ndim == 4 else t_linear(a)),
]

# SAM2 torch checkpoint (facebookresearch format, the reference's
# sam2.1_hiera_large.pt, sam2_masker.py:19-20) -> models/sam2 naming.
# Validated structurally by tests/test_sam2_fb_convert.py: a synthetic
# fb-layout state dict (derived from the HF oracle) converts to the
# SAME tree as the end-to-end-validated HF route.
def sam2_fb_preprocess(state: dict) -> dict:
    """Multi-key merges regex rules can't express: the fb prompt encoder
    stores 4 separate (1, C) point embeddings; our tree (and HF) use one
    stacked (4, C) table."""
    out = {}
    points = {}
    for k, v in state.items():
        m = re.match(r"^sam_prompt_encoder\.point_embeddings\.(\d)\.weight$",
                     k)
        if m:
            points[int(m.group(1))] = np.asarray(v)
        else:
            out[k] = v
    if points:
        out["sam_prompt_encoder.point_embeddings"] = np.concatenate(
            [points[i] for i in sorted(points)], axis=0)
    return out


SAM2_RULES: list[tuple[str, str]] = [
    # mask-prompt path: unused by the reference surface (clicks/boxes
    # only, sam2_masker.py:121-138); pos-enc buffer unused by sam2.1
    (r"\.mask_downscaling\.", None),
    (r"^mask_downsample\.", None),
    (r"^no_mem_pos_enc$", None),
    # top-level video params (fb names -> ours)
    (r"^no_mem_embed$", "no_memory_embedding"),
    (r"^no_obj_ptr$", "no_object_pointer"),
    (r"^no_obj_embed_spatial$", "occlusion_spatial_embedding"),
    (r"^obj_ptr_proj\.", "decoder.obj_ptr_proj."),
    (r"^obj_ptr_tpos_proj\.", "obj_ptr_tpos_proj."),
    # component prefixes
    (r"^image_encoder\.trunk\.", "hiera."),
    (r"^image_encoder\.neck\.", "neck."),
    (r"^sam_prompt_encoder\.", "prompt_encoder."),
    (r"^sam_mask_decoder\.", "decoder."),
    # hiera / generic MLPs
    (r"\.mlp\.layers\.0\.", ".mlp_fc1."),
    (r"\.mlp\.layers\.1\.", ".mlp_fc2."),
    # mask decoder
    (r"\.mlp\.lin([12])\.", r".mlp_lin\1."),
    (r"\.output_upscaling\.0\.", ".output_upscaling_0."),
    (r"\.output_upscaling\.1\.", ".output_upscaling_ln."),
    (r"\.output_upscaling\.3\.", ".output_upscaling_1."),
    (r"\.conv_s0\.", ".conv_s4."),
    (r"\.conv_s1\.", ".conv_s8."),
    (r"\.(iou_token|mask_tokens|obj_score_token)\.weight$", r".\1"),
    (r"\.(not_a_point_embed|no_mask_embed)\.weight$", r".\1"),
    # memory encoder (fb Sequential/DownSampler/CXBlock names -> ours)
    (r"mask_downsampler\.encoder\.(\d+)\.",
     lambda m: (f"mask_downsampler_final_conv."
                if int(m.group(1)) % 3 == 0 and int(m.group(1)) >= 12 else
                f"mask_downsampler_layers_{int(m.group(1)) // 3}."
                + ("conv." if int(m.group(1)) % 3 == 0 else "layer_norm."))),
    (r"memory_encoder\.pix_feat_proj\.", "memory_encoder.feature_projection."),
    (r"memory_encoder\.out_proj\.", "memory_encoder.projection."),
    (r"memory_encoder\.fuser\.layers\.(\d+)\.",
     r"memory_encoder.memory_fuser_layers_\1."),
    (r"\.dwconv\.", ".depthwise_conv."),
    (r"\.pwconv([12])\.", r".pointwise_conv\1."),
    (r"memory_fuser_layers_(\d+)\.norm\.", r"memory_fuser_layers_\1.layer_norm."),
    # fb CXBlock layer-scale parameter is `gamma`; ours is `scale`
    (r"memory_fuser_layers_(\d+)\.gamma$", r"memory_fuser_layers_\1.scale"),
    # fb FpnNeck wraps each 1x1 in a submodule: neck.convs.N.conv.weight
    (r"^neck\.convs\.(\d+)\.conv\.", r"neck.convs.\1."),
]

# Hiera absolute position embeddings are stored NCHW in both the fb and
# HF checkpoints; our params are NHWC. Prompt-encoder single-row
# embedding tables flatten to vectors; the decoder's 1x1 high-res skip
# convs become Dense kernels.
SAM2_SPECIALS: list = [
    (r"(^|\.)pos_embed(_window)?$", None,
     lambda a: np.transpose(a, (0, 2, 3, 1))),
    (r"(not_a_point_embed|no_mask_embed)$", None, lambda a: a.reshape(-1)),
    (r"conv_s[48]\.weight$", "kernel", lambda a: a[:, :, 0, 0].T),
    (r"output_upscaling_[01]\.weight$", "kernel", t_conv_transpose),
    # embedding tables / buffers that must keep their (renamed) leaf and
    # raw layout (the generic .weight inference would transpose them)
    (r"positional_encoding_gaussian_matrix$",
     "positional_encoding_gaussian_matrix", t_identity),
    (r"\.point_embeddings$", "point_embeddings", t_identity),
    (r"\.(iou_token|mask_tokens|obj_score_token)$", None, t_identity),
    # video-level parameter layouts
    (r"^no_memory_embedding$", None, t_identity),          # (1, 1, d)
    (r"^no_object_pointer$", None, lambda a: a.reshape(-1)),
    (r"^occlusion_spatial_embedding$", None, lambda a: a.reshape(-1)),
    (r"^maskmem_tpos_enc$", None,
     lambda a: a.reshape(a.shape[0], a.shape[-1])),  # (n,1,1,m) -> (n,m)
]

# HF transformers Sam2 (Sam2HieraDetModel / Sam2VideoModel) naming ->
# models/sam2. Used by the parity harness: transformers ships the
# official SAM2 architecture, so a randomly-initialized HF model is a
# bit-exact oracle for our modules without downloading weights.
HF_SAM2_RULES: list[tuple[str, str]] = [
    (r"^(vision_encoder\.)?backbone\.", "hiera."),
    (r"^(vision_encoder\.)?neck\.", "neck."),
    (r"^mask_decoder\.", "decoder."),
    (r"^object_pointer_proj\.", "decoder.obj_ptr_proj."),
    (r"^prompt_encoder\.shared_embedding\.positional_embedding$",
     "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    (r"^prompt_encoder\.point_embed\.weight$",
     "prompt_encoder.point_embeddings"),
    (r"^prompt_encoder\.(not_a_point_embed|no_mask_embed)\.weight$",
     r"prompt_encoder.\1"),
    (r"^prompt_encoder\.mask_embed\.", None),  # mask prompts: not used by
    # the reference surface (clicks/boxes only, sam2_masker.py:121-138)
    (r"patch_embed\.projection\.", "patch_embed.proj."),
    # mask decoder: two-way transformer blocks
    (r"(transformer\.layers\.\d+)\.mlp\.proj_in\.", r"\1.mlp_lin1."),
    (r"(transformer\.layers\.\d+)\.mlp\.proj_out\.", r"\1.mlp_lin2."),
    (r"\.o_proj\.", ".out_proj."),
    (r"\.layer_norm_final_attn\.", ".norm_final_attn."),
    # mask decoder: 3-layer FeedForward heads -> our MLP layers_{0,1,2}
    # (middle layer FIRST so proj_in's rewrite to layers.0 isn't re-hit)
    (r"(iou_prediction_head|pred_obj_score_head|obj_ptr_proj|"
     r"output_hypernetworks_mlps\.\d+)\.layers\.0\.", r"\1.layers.1."),
    (r"(iou_prediction_head|pred_obj_score_head|obj_ptr_proj|"
     r"output_hypernetworks_mlps\.\d+)\.proj_in\.", r"\1.layers.0."),
    (r"(iou_prediction_head|pred_obj_score_head|obj_ptr_proj|"
     r"output_hypernetworks_mlps\.\d+)\.proj_out\.", r"\1.layers.2."),
    # mask decoder: upscaling + skip projections + tokens
    (r"\.upscale_conv1\.", ".output_upscaling_0."),
    (r"\.upscale_conv2\.", ".output_upscaling_1."),
    (r"\.upscale_layer_norm\.", ".output_upscaling_ln."),
    (r"\.conv_s0\.", ".conv_s4."),
    (r"\.conv_s1\.", ".conv_s8."),
    (r"\.(iou_token|mask_tokens|obj_score_token)\.weight$", r".\1"),
    # memory attention / encoder (video model)
    (r"^memory_attention\.layer_norm\.", "memory_attention.norm."),
    (r"mask_downsampler\.layers\.(\d+)\.", r"mask_downsampler_layers_\1."),
    (r"mask_downsampler\.final_conv\.", "mask_downsampler_final_conv."),
    (r"memory_fuser\.layers\.(\d+)\.", r"memory_fuser_layers_\1."),
    # video-level parameters
    (r"^no_memory_embedding$", "no_memory_embedding"),
    (r"^no_object_pointer$", "no_object_pointer"),
    (r"^occlusion_spatial_embedding_parameter$",
     "occlusion_spatial_embedding"),
    (r"^memory_temporal_positional_encoding$", "maskmem_tpos_enc"),
    (r"^temporal_positional_encoding_projection_layer\.",
     "obj_ptr_tpos_proj."),
    (r"^no_memory_positional_encoding$", None),  # sam2.1 adds the
    # no-memory embedding directly; this buffer is unused
    (r"^mask_downsample\.", None),   # mask-prompt path (unused surface)
    (r"^shared_image_embedding\.", None),  # tied to prompt_encoder's
    # generic layer norms / MLPs (Hiera, memory attention)
    (r"\.layer_norm1\.", ".norm1."),
    (r"\.layer_norm2\.", ".norm2."),
    (r"\.layer_norm3\.", ".norm3."),
    (r"\.layer_norm4\.", ".norm4."),
    (r"\.mlp\.proj_in\.", ".mlp_fc1."),
    (r"\.mlp\.proj_out\.", ".mlp_fc2."),
]


# RAFT (raft-things.pth, DataParallel "module." prefix) -> propainter/raft.py
# naming. Instance norms are parameter-free; batch norms keep running
# stats as leaves (running_mean/running_var, FrozenBatchNorm).
RAFT_RULES: list[tuple[str, str]] = [
    (r"^module\.", ""),
    (r"(^|\.)layer([123])\.([01])\.", r"\1layer\2_\3."),
    (r"(^|\.)downsample\.0\.", r"\1downsample_conv."),
    (r"(^|\.)downsample\.1\.", r"\1downsample_norm."),
    (r"(^|\.)mask\.0\.", r"\1mask_0."),
    (r"(^|\.)mask\.2\.", r"\1mask_2."),
    (r"num_batches_tracked$", None),
]


# recurrent_flow_completion.pth -> models/propainter/flow_completion.py
FLOWCOMP_RULES: list[tuple[str, str]] = [
    (r"^module\.", ""),
    (r"^edgeDetector\.", None),  # training-only edge head
    (r"^downsample\.0\.", "downsample_0."),
    (r"^(encoder[12]|mid_dilation)\.(\d)\.", r"\1_\2."),
    (r"\.conv([12])\.0\.", r".conv\1_0."),
    (r"^(decoder[12]|upsample)\.0\.", r"\1_0."),
    # deconv is a module holding .conv (2x upsample + conv)
    (r"^(decoder[12]|upsample)\.2\.conv\.", r"\1_2.conv."),
    (r"^feat_prop_module\.deform_align\.(backward_|forward_)\."
     r"conv_offset\.(\d)\.",
     r"feat_prop_module.step_\1.deform_align.conv_offset_\2."),
    (r"^feat_prop_module\.deform_align\.(backward_|forward_)\.",
     r"feat_prop_module.step_\1.deform_align."),
    (r"^feat_prop_module\.backbone\.(backward_|forward_)\.([02])\.",
     r"feat_prop_module.step_\1.backbone_\2."),
]


# ProPainter.pth (InpaintGenerator) -> models/propainter/inpaint_generator.py
PROPAINTER_RULES: list[tuple[str, str]] = [
    (r"^module\.", ""),
    (r"^decoder\.0\.conv\.", "decoder_0.conv."),
    (r"^decoder\.2\.", "decoder_2."),
    (r"^decoder\.4\.conv\.", "decoder_4.conv."),
    (r"^decoder\.6\.", "decoder_6."),
    (r"\.deform_align\.(backward_1|forward_1)\.conv_offset\.(\d)\.",
     r".step_\1.deform_align.conv_offset_\2."),
    (r"\.deform_align\.(backward_1|forward_1)\.", r".step_\1.deform_align."),
    (r"\.backbone\.(backward_1|forward_1)\.([02])\.",
     r".step_\1.backbone_\2."),
    (r"\.fuse\.([02])\.", r".fuse_\1."),
    (r"\.transformer\.(\d+)\.", r".transformer_\1."),
    (r"\.fc1\.0\.", ".fc1_0."),
    (r"\.fc2\.1\.", ".fc2_1."),
    # training-only heads, if present in the checkpoint
    (r"^(discriminator|dis)\.", None),
]


# ---------------------------------------------------------------------------
# LoRA ingestion + merge (the reference's "2-Step" checkpoint is a PCM
# LoRA applied to the SD1.5 UNet: /root/reference/diffuerase.py:37-45
# selects it, install_videovanish.sh:79 pins peft to apply it). We merge
# the low-rank update into the dense weights at CONVERSION time — at
# inference the TPU then runs one dense matmul instead of W@x + B@(A@x),
# and the rest of the pipeline never knows LoRA existed.
# ---------------------------------------------------------------------------
_LORA_SUFFIXES = (
    # (suffix, role) — peft / new-diffusers, old-diffusers attn-procs,
    # and kohya/webui factor names, plus the kohya per-module alpha
    (".lora_A.default.weight", "down"), (".lora_B.default.weight", "up"),
    (".lora_A.weight", "down"), (".lora_B.weight", "up"),
    (".lora.down.weight", "down"), (".lora.up.weight", "up"),
    (".lora_down.weight", "down"), (".lora_up.weight", "up"),
    (".alpha", "alpha"),
)


def parse_lora_state(state: dict, component: str = "unet") -> dict:
    """Parse a LoRA state dict into {base_name: {down, up, alpha}}.

    Accepts the two public layouts the PCM/diffusers ecosystem ships:
      peft / diffusers:  "unet.<dotted.path>.lora_A.weight" / "lora_B..."
      kohya / webui:     "lora_unet_<path_with_underscores>.lora_down..."
    base_name keeps whatever separator style the file used; merge_lora
    resolves names against the base checkpoint underscore-insensitively,
    so kohya's flattened names need no UNet-specific name table.
    component selects which tower's entries to keep ("unet" or
    "text_encoder") — PCM ships UNet-only LoRAs but the parser is shared.
    """
    out: dict = {}
    for key, val in state.items():
        for suf, role in _LORA_SUFFIXES:
            if key.endswith(suf):
                base = key[: -len(suf)]
                break
        else:
            continue  # not a LoRA leaf (e.g. embedded metadata)
        if base.startswith("base_model.model."):
            # raw peft save (get_peft_model_state_dict) — single-tower,
            # no tower prefix after stripping. Route by module path so
            # parsing the same save for the OTHER tower yields nothing
            # (CLIPTextModel paths start with "text_model."; SD UNet
            # paths start with down_blocks/up_blocks/mid_block/...).
            base = base[len("base_model.model."):]
            tower = "text_encoder" if base.startswith("text_model.") \
                else "unet"
            if component != tower:
                continue
        if base.startswith("lora_unet_"):
            if component != "unet":
                continue
            base = base[len("lora_unet_"):]
        elif re.match(r"^lora_te\d?_", base):
            if component != "text_encoder":
                continue
            base = re.sub(r"^lora_te\d?_", "", base)
        elif base.startswith("unet."):
            if component != "unet":
                continue
            base = base[len("unet."):]
        elif base.startswith("text_encoder."):
            if component != "text_encoder":
                continue
            base = base[len("text_encoder."):]
        arr = np.asarray(val)
        out.setdefault(base, {})[role] = \
            float(arr) if role == "alpha" else arr
    for base, ent in out.items():
        if "down" not in ent or "up" not in ent:
            raise ValueError(f"LoRA entry {base!r} is missing its "
                             f"{'up' if 'down' in ent else 'down'} factor")
    return out


def merge_lora(base_state: dict, lora: dict, scale: float = 1.0,
               strict: bool = True) -> dict:
    """Return a new torch-layout state dict with
    W + scale * (alpha/r) * up @ down folded into every targeted weight.

    Operates on the UNCONVERTED torch state dict so one code path covers
    Linear (2-D), 1x1-Conv (peft on SD1.5's proj_in/out) and LoCon-style
    kxk-Conv factors; layout transposes then happen once, downstream in
    convert_state_dict. strict=True raises if any LoRA entry fails to
    find its base weight — silently dropping distillation weights would
    corrupt the 2-step model without any error signal.
    """
    flat_index = {k[: -len(".weight")].replace(".", "_"): k
                  for k in base_state if k.endswith(".weight")}
    out = dict(base_state)
    misses = []
    for name, ent in lora.items():
        k = flat_index.get(name.replace(".", "_"))
        if k is None:
            misses.append(name)
            continue
        w = np.asarray(out[k])
        down = np.asarray(ent["down"], np.float32)
        up = np.asarray(ent["up"], np.float32)
        r = down.shape[0]
        if up.ndim == 4 and up.shape[2:] != (1, 1):
            raise ValueError(f"LoRA {name!r}: up factor with spatial "
                             f"extent {up.shape} is not supported")
        alpha = ent.get("alpha", float(r))
        delta = up.reshape(up.shape[0], -1) @ down.reshape(r, -1)
        delta = delta.reshape((up.shape[0],) + down.shape[1:])
        delta = delta * (scale * alpha / r)
        if delta.shape != w.shape:
            if delta.size == w.size:  # 2-D factors onto a 1x1 conv
                delta = delta.reshape(w.shape)
            else:
                raise ValueError(
                    f"LoRA {name!r}: delta {delta.shape} does not match "
                    f"base weight {k!r} {w.shape}")
        out[k] = (w.astype(np.float32) + delta).astype(w.dtype)
    if misses and strict:
        raise ValueError(
            f"{len(misses)} LoRA entries matched no base weight "
            f"(first: {misses[:5]}); pass strict=False to skip them")
    return out


def load_torch_state(path: str) -> dict:
    """Load a .pt/.pth/.safetensors file as {key: np.ndarray}. Torch
    stays a host-side conversion dependency only."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    state = obj.get("model", obj.get("state_dict", obj)) \
        if isinstance(obj, dict) else obj
    return {k: v.numpy() for k, v in state.items()}


def convert_torch_file(path: str, rules, out_path: str = None,
                       special=(), preprocess=None,
                       lora_paths=(), lora_scale: float = 1.0):
    """Load a torch checkpoint, optionally fold LoRA file(s) into it
    (the reference's PCM "2-Step" route), then name-remap + save."""
    state = load_torch_state(path)
    for lp in lora_paths:
        state = merge_lora(state, parse_lora_state(load_torch_state(lp)),
                           scale=lora_scale)
    if preprocess is not None:
        state = preprocess(state)
    tree = convert_state_dict(state, rules, special)
    if out_path:
        from videovanish_tpu.core.checkpoint import save_pytree
        save_pytree(out_path, tree)
    return tree
