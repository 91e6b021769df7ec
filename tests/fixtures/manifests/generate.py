"""Generate checkpoint key-inventory manifests (JSON: {torch key: shape}).

These pin the EXACT key inventories of the published checkpoints the
reference downloads (diffuerase.py:37-49, install_videovanish.sh:68-70,
sam2_masker.py:19-20), at production shapes, so conversion rules are
rehearsed against the real names — not against torch modules written by
the same hand as the rules (VERDICT r2, missing #3).

Provenance (this host has zero egress — inventories cannot be fetched):
  clip_vit_l_text.json      generated from transformers' CLIPTextModel at
                            the openai/clip-vit-large-patch14 config —
                            EXACT (the library defines the layout).
  all others                encoded from the published model code:
                            diffusers UNet2DConditionModel /
                            UNetMotionModel / AutoencoderKL (old-style
                            attention keys as shipped in sd-vae-ft-mse),
                            TencentARC BrushNet (brushnet_CA),
                            sczhou/ProPainter (three files),
                            princeton-vl RAFT (raft-things.pth,
                            DataParallel "module." prefix),
                            facebookresearch/sam2 (sam2.1_hiera_large).
                            Best-effort from the public sources; diff
                            against real files on a networked host before
                            first production conversion.

Run:  python tests/fixtures/manifests/generate.py
"""
import json
import math
import os

OUT = os.path.dirname(os.path.abspath(__file__))

CH = (320, 640, 1280, 1280)
TEMB = 1280
CTX = 768


def _w(d, key, *shape):
    d[key] = list(shape)


def resnet(d, p, cin, cout, time_emb=True):
    _w(d, f"{p}.norm1.weight", cin); _w(d, f"{p}.norm1.bias", cin)
    _w(d, f"{p}.conv1.weight", cout, cin, 3, 3); _w(d, f"{p}.conv1.bias", cout)
    if time_emb:
        _w(d, f"{p}.time_emb_proj.weight", cout, TEMB)
        _w(d, f"{p}.time_emb_proj.bias", cout)
    _w(d, f"{p}.norm2.weight", cout); _w(d, f"{p}.norm2.bias", cout)
    _w(d, f"{p}.conv2.weight", cout, cout, 3, 3); _w(d, f"{p}.conv2.bias", cout)
    if cin != cout:
        _w(d, f"{p}.conv_shortcut.weight", cout, cin, 1, 1)
        _w(d, f"{p}.conv_shortcut.bias", cout)


def spatial_transformer(d, p, c):
    """diffusers Transformer2DModel, use_linear_projection=False."""
    _w(d, f"{p}.norm.weight", c); _w(d, f"{p}.norm.bias", c)
    _w(d, f"{p}.proj_in.weight", c, c, 1, 1); _w(d, f"{p}.proj_in.bias", c)
    tb = f"{p}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        _w(d, f"{tb}.{n}.weight", c); _w(d, f"{tb}.{n}.bias", c)
    for a, kv in (("attn1", c), ("attn2", CTX)):
        _w(d, f"{tb}.{a}.to_q.weight", c, c)
        _w(d, f"{tb}.{a}.to_k.weight", c, kv)
        _w(d, f"{tb}.{a}.to_v.weight", c, kv)
        _w(d, f"{tb}.{a}.to_out.0.weight", c, c)
        _w(d, f"{tb}.{a}.to_out.0.bias", c)
    _w(d, f"{tb}.ff.net.0.proj.weight", 8 * c, c)
    _w(d, f"{tb}.ff.net.0.proj.bias", 8 * c)
    _w(d, f"{tb}.ff.net.2.weight", c, 4 * c)
    _w(d, f"{tb}.ff.net.2.bias", c)
    _w(d, f"{p}.proj_out.weight", c, c, 1, 1); _w(d, f"{p}.proj_out.bias", c)


def motion_module(d, p, c):
    """diffusers TransformerTemporalModel (UNetMotionModel layout):
    GN -> proj_in -> [norm1 +PE attn1, norm2 +PE attn2, norm3 ff] ->
    proj_out. attn2 is temporal SELF attention (kv dim = c)."""
    _w(d, f"{p}.norm.weight", c); _w(d, f"{p}.norm.bias", c)
    _w(d, f"{p}.proj_in.weight", c, c); _w(d, f"{p}.proj_in.bias", c)
    tb = f"{p}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        _w(d, f"{tb}.{n}.weight", c); _w(d, f"{tb}.{n}.bias", c)
    for a in ("attn1", "attn2"):
        _w(d, f"{tb}.{a}.to_q.weight", c, c)
        _w(d, f"{tb}.{a}.to_k.weight", c, c)
        _w(d, f"{tb}.{a}.to_v.weight", c, c)
        _w(d, f"{tb}.{a}.to_out.0.weight", c, c)
        _w(d, f"{tb}.{a}.to_out.0.bias", c)
    _w(d, f"{tb}.ff.net.0.proj.weight", 8 * c, c)
    _w(d, f"{tb}.ff.net.0.proj.bias", 8 * c)
    _w(d, f"{tb}.ff.net.2.weight", c, 4 * c)
    _w(d, f"{tb}.ff.net.2.bias", c)
    _w(d, f"{p}.proj_out.weight", c, c); _w(d, f"{p}.proj_out.bias", c)


def unet_trunk(d, in_channels, motion=False):
    """Shared UNet2DConditionModel trunk (down/mid/up + time embedding).
    SD1.5: CrossAttnDownBlock2D x3 + DownBlock2D / UNetMidBlock2DCrossAttn
    / UpBlock2D + CrossAttnUpBlock2D x3, layers_per_block=2."""
    _w(d, "conv_in.weight", CH[0], in_channels, 3, 3)
    _w(d, "conv_in.bias", CH[0])
    _w(d, "time_embedding.linear_1.weight", TEMB, CH[0])
    _w(d, "time_embedding.linear_1.bias", TEMB)
    _w(d, "time_embedding.linear_2.weight", TEMB, TEMB)
    _w(d, "time_embedding.linear_2.bias", TEMB)
    prev = CH[0]
    skips = [CH[0]]
    for i, c in enumerate(CH):
        p = f"down_blocks.{i}"
        for j in range(2):
            resnet(d, f"{p}.resnets.{j}", prev if j == 0 else c, c)
            if i < 3:
                spatial_transformer(d, f"{p}.attentions.{j}", c)
            if motion:
                motion_module(d, f"{p}.motion_modules.{j}", c)
            skips.append(c)
        if i < 3:
            _w(d, f"{p}.downsamplers.0.conv.weight", c, c, 3, 3)
            _w(d, f"{p}.downsamplers.0.conv.bias", c)
            skips.append(c)
        prev = c
    resnet(d, "mid_block.resnets.0", CH[-1], CH[-1])
    spatial_transformer(d, "mid_block.attentions.0", CH[-1])
    if motion:
        motion_module(d, "mid_block.motion_modules.0", CH[-1])
    resnet(d, "mid_block.resnets.1", CH[-1], CH[-1])
    prev = CH[-1]
    for i, c in enumerate(reversed(CH)):
        p = f"up_blocks.{i}"
        for j in range(3):
            resnet(d, f"{p}.resnets.{j}", prev + skips.pop(), c)
            prev = c
            if i > 0:
                spatial_transformer(d, f"{p}.attentions.{j}", c)
            if motion:
                motion_module(d, f"{p}.motion_modules.{j}", c)
        if i < 3:
            _w(d, f"{p}.upsamplers.0.conv.weight", c, c, 3, 3)
            _w(d, f"{p}.upsamplers.0.conv.bias", c)


def gen_sd15_unet(motion=False):
    d = {}
    unet_trunk(d, 4, motion=motion)
    _w(d, "conv_norm_out.weight", CH[0]); _w(d, "conv_norm_out.bias", CH[0])
    _w(d, "conv_out.weight", 4, CH[0], 3, 3); _w(d, "conv_out.bias", 4)
    return d


def gen_brushnet():
    """TencentARC BrushNetModel (brushnet_CA: keeps cross-attention, as
    in lixiaowen/diffuEraser's `brushnet` subfolder). Full UNet clone
    minus conv_norm_out/conv_out, plus conv_in_condition (9 = noisy
    latent 4 + masked-image latent 4 + mask 1) and 25 zero convs."""
    d = {}
    unet_trunk(d, 9, motion=False)
    # the trunk emits conv_in.*; BrushNet names it conv_in_condition
    d["conv_in_condition.weight"] = d.pop("conv_in.weight")
    d["conv_in_condition.bias"] = d.pop("conv_in.bias")
    down_taps = [CH[0]]
    for i, c in enumerate(CH):
        down_taps += [c, c]
        if i < 3:
            down_taps.append(c)
    for i, c in enumerate(down_taps):
        _w(d, f"brushnet_down_blocks.{i}.weight", c, c, 1, 1)
        _w(d, f"brushnet_down_blocks.{i}.bias", c)
    _w(d, "brushnet_mid_block.weight", CH[-1], CH[-1], 1, 1)
    _w(d, "brushnet_mid_block.bias", CH[-1])
    up_taps = [c for c in reversed(CH) for _ in range(3)]
    for i, c in enumerate(up_taps):
        _w(d, f"brushnet_up_blocks.{i}.weight", c, c, 1, 1)
        _w(d, f"brushnet_up_blocks.{i}.bias", c)
    return d


def gen_vae():
    """stabilityai/sd-vae-ft-mse AutoencoderKL. The published file
    predates diffusers' attention rename: the mid-block attention ships
    as query/key/value/proj_attn (2-D Linear weights WITH biases), which
    diffusers >=0.18 remaps on load. VAE resnets have no time_emb."""
    d = {}
    vch = (128, 256, 512, 512)

    def vae_attn(p, c):
        _w(d, f"{p}.group_norm.weight", c); _w(d, f"{p}.group_norm.bias", c)
        for n in ("query", "key", "value", "proj_attn"):
            _w(d, f"{p}.{n}.weight", c, c); _w(d, f"{p}.{n}.bias", c)

    _w(d, "encoder.conv_in.weight", vch[0], 3, 3, 3)
    _w(d, "encoder.conv_in.bias", vch[0])
    prev = vch[0]
    for i, c in enumerate(vch):
        p = f"encoder.down_blocks.{i}"
        for j in range(2):
            resnet(d, f"{p}.resnets.{j}", prev if j == 0 else c, c,
                   time_emb=False)
        if i < 3:
            _w(d, f"{p}.downsamplers.0.conv.weight", c, c, 3, 3)
            _w(d, f"{p}.downsamplers.0.conv.bias", c)
        prev = c
    resnet(d, "encoder.mid_block.resnets.0", vch[-1], vch[-1], time_emb=False)
    vae_attn("encoder.mid_block.attentions.0", vch[-1])
    resnet(d, "encoder.mid_block.resnets.1", vch[-1], vch[-1], time_emb=False)
    _w(d, "encoder.conv_norm_out.weight", vch[-1])
    _w(d, "encoder.conv_norm_out.bias", vch[-1])
    _w(d, "encoder.conv_out.weight", 8, vch[-1], 3, 3)
    _w(d, "encoder.conv_out.bias", 8)

    _w(d, "decoder.conv_in.weight", vch[-1], 4, 3, 3)
    _w(d, "decoder.conv_in.bias", vch[-1])
    resnet(d, "decoder.mid_block.resnets.0", vch[-1], vch[-1], time_emb=False)
    vae_attn("decoder.mid_block.attentions.0", vch[-1])
    resnet(d, "decoder.mid_block.resnets.1", vch[-1], vch[-1], time_emb=False)
    prev = vch[-1]
    for i, c in enumerate(reversed(vch)):
        p = f"decoder.up_blocks.{i}"
        for j in range(3):
            resnet(d, f"{p}.resnets.{j}", prev if j == 0 else c, c,
                   time_emb=False)
            prev = c
        if i < 3:
            _w(d, f"{p}.upsamplers.0.conv.weight", c, c, 3, 3)
            _w(d, f"{p}.upsamplers.0.conv.bias", c)
    _w(d, "decoder.conv_norm_out.weight", vch[0])
    _w(d, "decoder.conv_norm_out.bias", vch[0])
    _w(d, "decoder.conv_out.weight", 3, vch[0], 3, 3)
    _w(d, "decoder.conv_out.bias", 3)
    _w(d, "quant_conv.weight", 8, 8, 1, 1); _w(d, "quant_conv.bias", 8)
    _w(d, "post_quant_conv.weight", 4, 4, 1, 1)
    _w(d, "post_quant_conv.bias", 4)
    return d


def gen_clip_text():
    """EXACT: transformers defines this layout (SD1.5 text_encoder =
    CLIPTextModel at the openai/clip-vit-large-patch14 text config)."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77)
    with torch.device("meta"):
        m = CLIPTextModel(cfg)
    d = {k: list(v.shape) for k, v in m.state_dict().items()}
    # the published torch .bin additionally carries the position_ids
    # buffer (dropped by CLIP_RULES on conversion)
    d.setdefault("text_model.embeddings.position_ids", [1, 77])
    return d


def gen_pcm_lora():
    """wangfuyun/PCM_Weights sd15 2-step LoRA (the reference's "2-Step"
    ckpt, diffuerase.py:37-45): peft/diffusers-format UNet LoRA over
    every attention projection, rank 64."""
    rank = 64
    d = {}

    def lora(base, din, dout):
        _w(d, f"unet.{base}.lora_A.weight", rank, din)
        _w(d, f"unet.{base}.lora_B.weight", dout, rank)

    def attn_loras(p, c):
        tb = f"{p}.transformer_blocks.0"
        for a, kv in (("attn1", c), ("attn2", CTX)):
            lora(f"{tb}.{a}.to_q", c, c)
            lora(f"{tb}.{a}.to_k", kv, c)
            lora(f"{tb}.{a}.to_v", kv, c)
            lora(f"{tb}.{a}.to_out.0", c, c)

    for i, c in enumerate(CH):
        if i < 3:
            for j in range(2):
                attn_loras(f"down_blocks.{i}.attentions.{j}", c)
    attn_loras("mid_block.attentions.0", CH[-1])
    for i, c in enumerate(reversed(CH)):
        if i > 0:
            for j in range(3):
                attn_loras(f"up_blocks.{i}.attentions.{j}", c)
    return d


def gen_raft_things():
    """princeton-vl RAFT raft-things.pth (saved from DataParallel:
    "module." prefix). fnet norms are InstanceNorm2d (affine=False: no
    params); cnet norms are BatchNorm2d (5 tensors incl
    num_batches_tracked)."""
    d = {}

    def bn(p, c):
        for n in ("weight", "bias", "running_mean", "running_var"):
            _w(d, f"{p}.{n}", c)
        d[f"{p}.num_batches_tracked"] = []

    def encoder(name, batch_norm):
        p = f"module.{name}"
        _w(d, f"{p}.conv1.weight", 64, 3, 7, 7)
        _w(d, f"{p}.conv1.bias", 64)
        if batch_norm:
            bn(f"{p}.norm1", 64)
        chans = [(64, 64, "layer1"), (64, 96, "layer2"), (96, 128, "layer3")]
        for cin, cout, layer in chans:
            for b in range(2):
                bp = f"{p}.{layer}.{b}"
                c0 = cin if b == 0 else cout
                _w(d, f"{bp}.conv1.weight", cout, c0, 3, 3)
                _w(d, f"{bp}.conv1.bias", cout)
                _w(d, f"{bp}.conv2.weight", cout, cout, 3, 3)
                _w(d, f"{bp}.conv2.bias", cout)
                if batch_norm:
                    bn(f"{bp}.norm1", cout)
                    bn(f"{bp}.norm2", cout)
                if b == 0 and cin != cout:
                    _w(d, f"{bp}.downsample.0.weight", cout, cin, 1, 1)
                    _w(d, f"{bp}.downsample.0.bias", cout)
                    if batch_norm:
                        bn(f"{bp}.downsample.1", cout)
        _w(d, f"{p}.conv2.weight", 256, 128, 1, 1)
        _w(d, f"{p}.conv2.bias", 256)

    encoder("fnet", batch_norm=False)   # norm_fn='instance'
    encoder("cnet", batch_norm=True)    # norm_fn='batch'
    u = "module.update_block"
    cor_planes = 4 * (2 * 4 + 1) ** 2   # corr_levels * (2r+1)^2 = 324
    _w(d, f"{u}.encoder.convc1.weight", 256, cor_planes, 1, 1)
    _w(d, f"{u}.encoder.convc1.bias", 256)
    _w(d, f"{u}.encoder.convc2.weight", 192, 256, 3, 3)
    _w(d, f"{u}.encoder.convc2.bias", 192)
    _w(d, f"{u}.encoder.convf1.weight", 128, 2, 7, 7)
    _w(d, f"{u}.encoder.convf1.bias", 128)
    _w(d, f"{u}.encoder.convf2.weight", 64, 128, 3, 3)
    _w(d, f"{u}.encoder.convf2.bias", 64)
    _w(d, f"{u}.encoder.conv.weight", 126, 256, 3, 3)
    _w(d, f"{u}.encoder.conv.bias", 126)
    for g in ("convz1", "convr1", "convq1"):
        _w(d, f"{u}.gru.{g}.weight", 128, 384, 1, 5)
        _w(d, f"{u}.gru.{g}.bias", 128)
    for g in ("convz2", "convr2", "convq2"):
        _w(d, f"{u}.gru.{g}.weight", 128, 384, 5, 1)
        _w(d, f"{u}.gru.{g}.bias", 128)
    _w(d, f"{u}.flow_head.conv1.weight", 256, 128, 3, 3)
    _w(d, f"{u}.flow_head.conv1.bias", 256)
    _w(d, f"{u}.flow_head.conv2.weight", 2, 256, 3, 3)
    _w(d, f"{u}.flow_head.conv2.bias", 2)
    _w(d, f"{u}.mask.0.weight", 256, 128, 3, 3)
    _w(d, f"{u}.mask.0.bias", 256)
    _w(d, f"{u}.mask.2.weight", 576, 256, 1, 1)
    _w(d, f"{u}.mask.2.bias", 576)
    return d


def deform_align(d, p, cin, cout, offset_in, deform_groups=16):
    """mmcv ModulatedDeformConv2d + conv_offset Sequential(0,2,4,6)."""
    _w(d, f"{p}.weight", cout, cin, 3, 3)
    _w(d, f"{p}.bias", cout)
    _w(d, f"{p}.conv_offset.0.weight", cout, offset_in, 3, 3)
    _w(d, f"{p}.conv_offset.0.bias", cout)
    _w(d, f"{p}.conv_offset.2.weight", cout, cout, 3, 3)
    _w(d, f"{p}.conv_offset.2.bias", cout)
    _w(d, f"{p}.conv_offset.4.weight", cout, cout, 3, 3)
    _w(d, f"{p}.conv_offset.4.bias", cout)
    _w(d, f"{p}.conv_offset.6.weight", 27 * deform_groups, cout, 3, 3)
    _w(d, f"{p}.conv_offset.6.bias", 27 * deform_groups)


def gen_flowcomp():
    """sczhou/ProPainter recurrent_flow_completion.pth
    (RecurrentFlowCompleteNet): P3D encoder (Conv3d pairs), dilated mid,
    bidirectional propagation with deformable alignment, 2D decoders.
    edgeDetector.* (training-only head) included: conversion drops it."""
    d = {}
    _w(d, "downsample.0.weight", 32, 3, 1, 5, 5)
    _w(d, "downsample.0.bias", 32)

    def p3d(p, cin, cout):
        _w(d, f"{p}.conv1.0.weight", cout, cin, 1, 3, 3)
        _w(d, f"{p}.conv1.0.bias", cout)
        _w(d, f"{p}.conv2.0.weight", cout, cout, 3, 1, 1)
        _w(d, f"{p}.conv2.0.bias", cout)

    p3d("encoder1.0", 32, 32)
    p3d("encoder1.2", 32, 64)
    p3d("encoder2.0", 64, 64)
    p3d("encoder2.2", 64, 128)
    for i, idx in enumerate((0, 2, 4)):
        _w(d, f"mid_dilation.{idx}.weight", 128, 128, 1, 3, 3)
        _w(d, f"mid_dilation.{idx}.bias", 128)
    for m in ("backward_", "forward_"):
        # SecondOrderDeformableAlignment(2*c, c): x = cat(prop_n1,
        # prop_n2); cond = cat(cond_n1, feat_current, cond_n2) -> 3c
        # (flow completion has no flows to condition on)
        deform_align(d, f"feat_prop_module.deform_align.{m}",
                     2 * 128, 128, offset_in=3 * 128, deform_groups=16)
        i = 0 if m == "backward_" else 1
        _w(d, f"feat_prop_module.backbone.{m}.0.weight",
           128, (2 + i) * 128, 3, 3)
        _w(d, f"feat_prop_module.backbone.{m}.0.bias", 128)
        _w(d, f"feat_prop_module.backbone.{m}.2.weight", 128, 128, 3, 3)
        _w(d, f"feat_prop_module.backbone.{m}.2.bias", 128)
    # fusion is a single 1x1 inside the propagation module
    _w(d, "feat_prop_module.fusion.weight", 128, 256, 1, 1)
    _w(d, "feat_prop_module.fusion.bias", 128)
    _w(d, "decoder2.0.weight", 128, 128, 3, 3)
    _w(d, "decoder2.0.bias", 128)
    _w(d, "decoder2.2.conv.weight", 64, 128, 3, 3)
    _w(d, "decoder2.2.conv.bias", 64)
    _w(d, "decoder1.0.weight", 64, 64, 3, 3)
    _w(d, "decoder1.0.bias", 64)
    _w(d, "decoder1.2.conv.weight", 32, 64, 3, 3)
    _w(d, "decoder1.2.conv.bias", 32)
    _w(d, "upsample.0.weight", 32, 32, 3, 3)
    _w(d, "upsample.0.bias", 32)
    _w(d, "upsample.2.conv.weight", 2, 32, 3, 3)
    _w(d, "upsample.2.conv.bias", 2)
    # training-only edge head (dropped on conversion)
    _w(d, "edgeDetector.projection.0.weight", 32, 34, 3, 3)
    _w(d, "edgeDetector.projection.0.bias", 32)
    _w(d, "edgeDetector.mid_layer_1.0.weight", 16, 32, 3, 3)
    _w(d, "edgeDetector.mid_layer_1.0.bias", 16)
    _w(d, "edgeDetector.mid_layer_2.0.weight", 16, 16, 3, 3)
    _w(d, "edgeDetector.mid_layer_2.0.bias", 16)
    _w(d, "edgeDetector.l_relu.weight", 1)
    _w(d, "edgeDetector.out_layer.weight", 1, 16, 1, 1)
    _w(d, "edgeDetector.out_layer.bias", 1)
    return d


def gen_propainter():
    """sczhou/ProPainter ProPainter.pth (InpaintGenerator): group-conv
    encoder, soft split/comp, 8 sparse temporal transformers, dual
    bidirectional propagation, decoder with deconv(.conv) upsamplers."""
    d = {}
    C, HID, DEPTHS = 128, 512, 8
    # group encoder: layers 10/12/14/16 concat the 256-ch x0 features
    # (group-interleaved) before convolving, so in = x0 + prev out
    enc = [
        (64, 5, 2, 1), (64, 64, 1, 1), (128, 64, 2, 1), (256, 128, 1, 1),
        (384, 256, 1, 1), (512, 640, 1, 2), (384, 768, 1, 4),
        (256, 640, 1, 8), (128, 512, 1, 1),
    ]
    for i, (cout, cin, _stride, groups) in enumerate(enc):
        _w(d, f"encoder.layers.{2 * i}.weight", cout, cin // groups, 3, 3)
        _w(d, f"encoder.layers.{2 * i}.bias", cout)
    # decoder: deconv(cin,cout) is a module holding .conv after interpolate
    _w(d, "decoder.0.conv.weight", 128, C, 3, 3)
    _w(d, "decoder.0.conv.bias", 128)
    _w(d, "decoder.2.weight", 64, 128, 3, 3)
    _w(d, "decoder.2.bias", 64)
    _w(d, "decoder.4.conv.weight", 64, 64, 3, 3)
    _w(d, "decoder.4.conv.bias", 64)
    _w(d, "decoder.6.weight", 3, 64, 3, 3)
    _w(d, "decoder.6.bias", 3)
    # soft split / comp (7x7 patches over 128 channels)
    _w(d, "ss.embedding.weight", HID, C * 49)
    _w(d, "ss.embedding.bias", HID)
    _w(d, "sc.embedding.weight", C * 49, HID)
    _w(d, "sc.embedding.bias", C * 49)
    _w(d, "sc.bias_conv.weight", C, C, 3, 3)
    _w(d, "sc.bias_conv.bias", C)
    # dual-domain bidirectional propagation (learnable variant)
    for m in ("backward_1", "forward_1"):
        # first-order flow-guided DeformableAlignment(c, c); conv_offset
        # conditioned on cat(cond_feat, warped_feat, flow, mask_flag)
        deform_align(d, f"feat_prop_module.deform_align.{m}",
                     C, C, offset_in=2 * C + 2 + 1 + 2, deform_groups=16)
        _w(d, f"feat_prop_module.backbone.{m}.0.weight",
           C, 2 * C + 2, 3, 3)
        _w(d, f"feat_prop_module.backbone.{m}.0.bias", C)
        _w(d, f"feat_prop_module.backbone.{m}.2.weight", C, C, 3, 3)
        _w(d, f"feat_prop_module.backbone.{m}.2.bias", C)
    _w(d, "feat_prop_module.fuse.0.weight", C, 2 * C + 2, 3, 3)
    _w(d, "feat_prop_module.fuse.0.bias", C)
    _w(d, "feat_prop_module.fuse.2.weight", C, C, 3, 3)
    _w(d, "feat_prop_module.fuse.2.bias", C)
    # sparse temporal transformers
    for i in range(DEPTHS):
        p = f"transformers.transformer.{i}"
        _w(d, f"{p}.norm1.weight", HID); _w(d, f"{p}.norm1.bias", HID)
        for n in ("key", "query", "value", "proj"):
            _w(d, f"{p}.attention.{n}.weight", HID, HID)
            _w(d, f"{p}.attention.{n}.bias", HID)
        # depthwise 4x4/4 k/v pooling conv (SparseWindowAttention)
        _w(d, f"{p}.attention.pool_layer.weight", HID, 1, 4, 4)
        _w(d, f"{p}.attention.pool_layer.bias", HID)
        _w(d, f"{p}.norm2.weight", HID); _w(d, f"{p}.norm2.bias", HID)
        _w(d, f"{p}.mlp.fc1.0.weight", 40 * 49, HID)
        _w(d, f"{p}.mlp.fc1.0.bias", 40 * 49)
        _w(d, f"{p}.mlp.fc2.1.weight", HID, 40 * 49)
        _w(d, f"{p}.mlp.fc2.1.bias", HID)
    return d


def gen_sam2_fb():
    """facebookresearch/sam2 sam2.1_hiera_large.pt ("model" dict).
    Hiera-L: embed 144, stages (2,6,36,4) = 48 blocks, dim doubles at
    blocks 2/8/44 (those carry .proj); SAM neck 256; memory dim 64."""
    d = {}
    E = 144
    stages = (2, 6, 36, 4)
    tr = "image_encoder.trunk"
    _w(d, f"{tr}.pos_embed", 1, E, 7, 7)
    _w(d, f"{tr}.pos_embed_window", 1, E, 8, 8)
    _w(d, f"{tr}.patch_embed.proj.weight", E, 3, 7, 7)
    _w(d, f"{tr}.patch_embed.proj.bias", E)
    stage_starts = []
    acc = 0
    for s in stages:
        stage_starts.append(acc)
        acc += s
    dim = E
    for b in range(sum(stages)):
        din = dim
        if b in stage_starts[1:]:
            dim *= 2
        p = f"{tr}.blocks.{b}"
        _w(d, f"{p}.norm1.weight", din); _w(d, f"{p}.norm1.bias", din)
        _w(d, f"{p}.attn.qkv.weight", 3 * dim, din)
        _w(d, f"{p}.attn.qkv.bias", 3 * dim)
        _w(d, f"{p}.attn.proj.weight", dim, dim)
        _w(d, f"{p}.attn.proj.bias", dim)
        _w(d, f"{p}.norm2.weight", dim); _w(d, f"{p}.norm2.bias", dim)
        _w(d, f"{p}.mlp.layers.0.weight", 4 * dim, dim)
        _w(d, f"{p}.mlp.layers.0.bias", 4 * dim)
        _w(d, f"{p}.mlp.layers.1.weight", dim, 4 * dim)
        _w(d, f"{p}.mlp.layers.1.bias", dim)
        if din != dim:
            _w(d, f"{p}.proj.weight", dim, din)
            _w(d, f"{p}.proj.bias", dim)
    for i, c in enumerate((1152, 576, 288, 144)):
        _w(d, f"image_encoder.neck.convs.{i}.conv.weight", 256, c, 1, 1)
        _w(d, f"image_encoder.neck.convs.{i}.conv.bias", 256)
    # memory attention: 4 layers, self RoPE (256) + cross to memory (64)
    for i in range(4):
        p = f"memory_attention.layers.{i}"
        for a, kv in (("self_attn", 256), ("cross_attn_image", 64)):
            _w(d, f"{p}.{a}.q_proj.weight", 256, 256)
            _w(d, f"{p}.{a}.q_proj.bias", 256)
            _w(d, f"{p}.{a}.k_proj.weight", 256, kv)
            _w(d, f"{p}.{a}.k_proj.bias", 256)
            _w(d, f"{p}.{a}.v_proj.weight", 256, kv)
            _w(d, f"{p}.{a}.v_proj.bias", 256)
            _w(d, f"{p}.{a}.out_proj.weight", 256, 256)
            _w(d, f"{p}.{a}.out_proj.bias", 256)
        _w(d, f"{p}.linear1.weight", 2048, 256)
        _w(d, f"{p}.linear1.bias", 2048)
        _w(d, f"{p}.linear2.weight", 256, 2048)
        _w(d, f"{p}.linear2.bias", 256)
        for n in ("norm1", "norm2", "norm3"):
            _w(d, f"{p}.{n}.weight", 256); _w(d, f"{p}.{n}.bias", 256)
    _w(d, "memory_attention.norm.weight", 256)
    _w(d, "memory_attention.norm.bias", 256)
    # memory encoder: mask downsampler (convs at 0,3,6,9 + final 12,
    # LayerNorm2d at 1,4,7,10), pix_feat_proj, 2 CXBlocks, out_proj
    me = "memory_encoder"
    chans = [(1, 4), (4, 16), (16, 64), (64, 256)]
    for i, (cin, cout) in enumerate(chans):
        _w(d, f"{me}.mask_downsampler.encoder.{3 * i}.weight",
           cout, cin, 3, 3)
        _w(d, f"{me}.mask_downsampler.encoder.{3 * i}.bias", cout)
        _w(d, f"{me}.mask_downsampler.encoder.{3 * i + 1}.weight", cout)
        _w(d, f"{me}.mask_downsampler.encoder.{3 * i + 1}.bias", cout)
    _w(d, f"{me}.mask_downsampler.encoder.12.weight", 256, 256, 1, 1)
    _w(d, f"{me}.mask_downsampler.encoder.12.bias", 256)
    _w(d, f"{me}.pix_feat_proj.weight", 256, 256, 1, 1)
    _w(d, f"{me}.pix_feat_proj.bias", 256)
    for i in range(2):
        p = f"{me}.fuser.layers.{i}"
        _w(d, f"{p}.dwconv.weight", 256, 1, 7, 7)
        _w(d, f"{p}.dwconv.bias", 256)
        _w(d, f"{p}.norm.weight", 256); _w(d, f"{p}.norm.bias", 256)
        _w(d, f"{p}.pwconv1.weight", 1024, 256)
        _w(d, f"{p}.pwconv1.bias", 1024)
        _w(d, f"{p}.pwconv2.weight", 256, 1024)
        _w(d, f"{p}.pwconv2.bias", 256)
        _w(d, f"{p}.gamma", 256)
    _w(d, f"{me}.out_proj.weight", 64, 256, 1, 1)
    _w(d, f"{me}.out_proj.bias", 64)
    # prompt encoder
    pe = "sam_prompt_encoder"
    _w(d, f"{pe}.pe_layer.positional_encoding_gaussian_matrix", 2, 128)
    for i in range(4):
        _w(d, f"{pe}.point_embeddings.{i}.weight", 1, 256)
    _w(d, f"{pe}.not_a_point_embed.weight", 1, 256)
    _w(d, f"{pe}.no_mask_embed.weight", 1, 256)
    # mask-prompt path (unused surface; dropped on conversion)
    _w(d, f"{pe}.mask_downscaling.0.weight", 4, 1, 2, 2)
    _w(d, f"{pe}.mask_downscaling.0.bias", 4)
    _w(d, f"{pe}.mask_downscaling.1.weight", 4)
    _w(d, f"{pe}.mask_downscaling.1.bias", 4)
    _w(d, f"{pe}.mask_downscaling.3.weight", 16, 4, 2, 2)
    _w(d, f"{pe}.mask_downscaling.3.bias", 16)
    _w(d, f"{pe}.mask_downscaling.4.weight", 16)
    _w(d, f"{pe}.mask_downscaling.4.bias", 16)
    _w(d, f"{pe}.mask_downscaling.6.weight", 256, 16, 1, 1)
    _w(d, f"{pe}.mask_downscaling.6.bias", 256)
    # mask decoder
    md = "sam_mask_decoder"
    for i in range(2):
        p = f"{md}.transformer.layers.{i}"
        for a, inner in (("self_attn", 256),
                         ("cross_attn_token_to_image", 128),
                         ("cross_attn_image_to_token", 128)):
            _w(d, f"{p}.{a}.q_proj.weight", inner, 256)
            _w(d, f"{p}.{a}.q_proj.bias", inner)
            _w(d, f"{p}.{a}.k_proj.weight", inner, 256)
            _w(d, f"{p}.{a}.k_proj.bias", inner)
            _w(d, f"{p}.{a}.v_proj.weight", inner, 256)
            _w(d, f"{p}.{a}.v_proj.bias", inner)
            _w(d, f"{p}.{a}.out_proj.weight", 256, inner)
            _w(d, f"{p}.{a}.out_proj.bias", 256)
        _w(d, f"{p}.mlp.lin1.weight", 2048, 256)
        _w(d, f"{p}.mlp.lin1.bias", 2048)
        _w(d, f"{p}.mlp.lin2.weight", 256, 2048)
        _w(d, f"{p}.mlp.lin2.bias", 256)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            _w(d, f"{p}.{n}.weight", 256); _w(d, f"{p}.{n}.bias", 256)
    fa = f"{md}.transformer.final_attn_token_to_image"
    _w(d, f"{fa}.q_proj.weight", 128, 256); _w(d, f"{fa}.q_proj.bias", 128)
    _w(d, f"{fa}.k_proj.weight", 128, 256); _w(d, f"{fa}.k_proj.bias", 128)
    _w(d, f"{fa}.v_proj.weight", 128, 256); _w(d, f"{fa}.v_proj.bias", 128)
    _w(d, f"{fa}.out_proj.weight", 256, 128)
    _w(d, f"{fa}.out_proj.bias", 256)
    _w(d, f"{md}.transformer.norm_final_attn.weight", 256)
    _w(d, f"{md}.transformer.norm_final_attn.bias", 256)
    _w(d, f"{md}.iou_token.weight", 1, 256)
    _w(d, f"{md}.mask_tokens.weight", 4, 256)
    _w(d, f"{md}.obj_score_token.weight", 1, 256)
    _w(d, f"{md}.output_upscaling.0.weight", 256, 64, 2, 2)
    _w(d, f"{md}.output_upscaling.0.bias", 64)
    _w(d, f"{md}.output_upscaling.1.weight", 64)
    _w(d, f"{md}.output_upscaling.1.bias", 64)
    _w(d, f"{md}.output_upscaling.3.weight", 64, 32, 2, 2)
    _w(d, f"{md}.output_upscaling.3.bias", 32)
    _w(d, f"{md}.conv_s0.weight", 32, 256, 1, 1)
    _w(d, f"{md}.conv_s0.bias", 32)
    _w(d, f"{md}.conv_s1.weight", 64, 256, 1, 1)
    _w(d, f"{md}.conv_s1.bias", 64)
    for i in range(4):
        p = f"{md}.output_hypernetworks_mlps.{i}"
        _w(d, f"{p}.layers.0.weight", 256, 256)
        _w(d, f"{p}.layers.0.bias", 256)
        _w(d, f"{p}.layers.1.weight", 256, 256)
        _w(d, f"{p}.layers.1.bias", 256)
        _w(d, f"{p}.layers.2.weight", 32, 256)
        _w(d, f"{p}.layers.2.bias", 32)
    for head, dout in (("iou_prediction_head", 4),
                       ("pred_obj_score_head", 1)):
        _w(d, f"{md}.{head}.layers.0.weight", 256, 256)
        _w(d, f"{md}.{head}.layers.0.bias", 256)
        _w(d, f"{md}.{head}.layers.1.weight", 256, 256)
        _w(d, f"{md}.{head}.layers.1.bias", 256)
        _w(d, f"{md}.{head}.layers.2.weight", dout, 256)
        _w(d, f"{md}.{head}.layers.2.bias", dout)
    # object pointers / video-level parameters
    for i in range(3):
        _w(d, f"obj_ptr_proj.layers.{i}.weight", 256, 256)
        _w(d, f"obj_ptr_proj.layers.{i}.bias", 256)
    _w(d, "obj_ptr_tpos_proj.weight", 64, 256)
    _w(d, "obj_ptr_tpos_proj.bias", 64)
    _w(d, "no_mem_embed", 1, 1, 256)
    _w(d, "no_mem_pos_enc", 1, 1, 256)
    _w(d, "no_obj_ptr", 1, 256)
    _w(d, "no_obj_embed_spatial", 1, 64)
    _w(d, "maskmem_tpos_enc", 7, 1, 1, 64)
    return d


def main():
    out = {
        "sd15_unet.json": gen_sd15_unet(motion=False),
        "diffueraser_unet_main.json": gen_sd15_unet(motion=True),
        "brushnet.json": gen_brushnet(),
        "sd_vae_ft_mse.json": gen_vae(),
        "clip_vit_l_text.json": gen_clip_text(),
        "pcm_sd15_2step_lora.json": gen_pcm_lora(),
        "raft_things.json": gen_raft_things(),
        "recurrent_flow_completion.json": gen_flowcomp(),
        "propainter.json": gen_propainter(),
        "sam2_1_hiera_large_fb.json": gen_sam2_fb(),
    }
    for name, d in out.items():
        path = os.path.join(OUT, name)
        with open(path, "w") as f:
            json.dump(d, f, indent=0, sort_keys=True)
        print(f"{name}: {len(d)} keys")


if __name__ == "__main__":
    main()
