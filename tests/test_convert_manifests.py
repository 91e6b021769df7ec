"""Conversion dress rehearsal against the REAL checkpoint key inventories.

The other conversion tests validate rules against torch modules the same
author wrote (VERDICT r2, missing #3). Here the source side is pinned by
frozen manifests of the PUBLISHED checkpoints' key inventories at
production shapes (tests/fixtures/manifests/*.json; provenance in
generate.py — the reference downloads these files at
diffuerase.py:37-49, install_videovanish.sh:68-70, sam2_masker.py:19-20).

For every checkpoint: build a zeros state dict from the manifest,
convert through the PRODUCTION rule sets (cli/convert.py uses the same
ones), and require the result to fill the production-size model's param
tree EXACTLY — every source key consumed or deliberately dropped, every
model leaf filled, every shape right. Model trees come from
jax.eval_shape (abstract init: no FLOPs, no memory).
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videovanish_tpu.core.convert import (
    FLOWCOMP_RULES, PROPAINTER_RULES, RAFT_RULES, SAM2_RULES,
    SAM2_SPECIALS, UNET_RULES, UNET_SPECIALS, VAE_RULES,
    convert_state_dict, merge_lora, parse_lora_state, sam2_fb_preprocess,
)

MANIFESTS = os.path.join(os.path.dirname(__file__), "fixtures", "manifests")


def zeros_state(name):
    with open(os.path.join(MANIFESTS, name)) as f:
        return {k: np.zeros(shape, np.float32)
                for k, shape in json.load(f).items()}


def leaf_paths(tree):
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out["/".join(str(getattr(k, "key", k)) for k in kp)] = \
            tuple(leaf.shape)
    return out


def assert_tree_match(converted, expected, label):
    c, e = leaf_paths(converted), leaf_paths(expected)
    missing = sorted(set(e) - set(c))
    extra = sorted(set(c) - set(e))
    assert not missing, f"{label}: model leaves left unfilled " \
                        f"({len(missing)}): {missing[:10]}"
    assert not extra, f"{label}: converted keys with no home in the " \
                      f"model ({len(extra)}): {extra[:10]}"
    bad = [(p, c[p], e[p]) for p in e if c[p] != e[p]]
    assert not bad, f"{label}: shape mismatches: {bad[:10]}"


def shapes_init(module_init, *args):
    return jax.eval_shape(module_init, jax.random.PRNGKey(0),
                          *args)["params"]


class TestDiffuEraserCheckpoints:
    def test_vae_sd_vae_ft_mse(self):
        from videovanish_tpu.models.diffueraser.vae import AutoencoderKL
        vae = AutoencoderKL((128, 256, 512, 512), 2, 4)
        enc = shapes_init(
            lambda k, x: vae.init(k, x, method=vae.encode),
            jnp.zeros((1, 64, 64, 3)))
        dec = shapes_init(
            lambda k, z: vae.init(k, z, method=vae.decode),
            jnp.zeros((1, 8, 8, 4)))
        expected = {**dec, **enc}
        converted = convert_state_dict(zeros_state("sd_vae_ft_mse.json"),
                                       VAE_RULES)
        assert_tree_match(converted, expected, "sd-vae-ft-mse")

    def test_unet_main_with_pcm_lora(self):
        """lixiaowen/diffuEraser unet_main (UNetMotionModel: SD1.5 + 21
        AnimateDiff motion modules) with the PCM "2-Step" LoRA folded in
        first — the exact production route (diffuerase.py:37-45)."""
        from videovanish_tpu.models.diffueraser.unet import UNetCondition
        state = zeros_state("diffueraser_unet_main.json")
        lora = parse_lora_state(zeros_state("pcm_sd15_2step_lora.json"))
        assert len(lora) == 128  # 16 attn pairs x 8 projections
        state = merge_lora(state, lora, strict=True)  # raises on a miss
        converted = convert_state_dict(state, UNET_RULES, UNET_SPECIALS)
        unet = UNetCondition()
        expected = shapes_init(
            lambda k, x, t, c: unet.init(k, x, t, c, 2),
            jnp.zeros((2, 16, 16, 4)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 77, 768)))
        assert_tree_match(converted, expected, "unet_main")

    def test_pcm_lora_targets_resolve_on_base_sd15(self):
        """The PCM LoRA also merges cleanly into the plain SD1.5 UNet
        (diffusers-0.29.2 inventory) — strict mode proves every LoRA
        entry finds its base weight."""
        state = zeros_state("sd15_unet.json")
        lora = parse_lora_state(zeros_state("pcm_sd15_2step_lora.json"))
        merged = merge_lora(state, lora, strict=True)
        assert set(merged) == set(state)

    def test_brushnet(self):
        from videovanish_tpu.models.diffueraser.brushnet import BrushNetModel
        converted = convert_state_dict(zeros_state("brushnet.json"),
                                       UNET_RULES, UNET_SPECIALS)
        bm = BrushNetModel()  # frame-wise: published ckpt has no motion
        expected = shapes_init(
            lambda k, x, t, c: bm.init(k, x, t, c, 2),
            jnp.zeros((2, 16, 16, 9)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 77, 768)))
        assert_tree_match(converted, expected, "brushnet")

    def test_clip_text_encoder(self):
        from videovanish_tpu.models.diffueraser.text_encoder import (
            CLIP_RULES, CLIP_SPECIAL, CLIPTextModel,
        )
        converted = convert_state_dict(zeros_state("clip_vit_l_text.json"),
                                       CLIP_RULES, CLIP_SPECIAL)
        clip = CLIPTextModel()
        expected = shapes_init(
            lambda k, ids: clip.init(k, ids),
            jnp.zeros((1, 77), jnp.int32))
        assert_tree_match(converted, expected, "clip-vit-l-text")


class TestSam2Checkpoint:
    def test_fb_hiera_large(self):
        """sam2.1_hiera_large.pt (fb layout) fills the production
        Hiera-L video predictor tree exactly."""
        from videovanish_tpu.models.sam2.predictor import Sam2VideoPredictor
        state = sam2_fb_preprocess(zeros_state("sam2_1_hiera_large_fb.json"))
        converted = convert_state_dict(state, SAM2_RULES, SAM2_SPECIALS)
        pred = Sam2VideoPredictor()  # production Sam2Config; zeros init
        assert_tree_match(converted, pred.params, "sam2.1-hiera-large")


class TestProPainterCheckpoints:
    @pytest.fixture(scope="class")
    def propainter_params(self):
        from videovanish_tpu.models.propainter.model import Propainter
        return Propainter().params  # production config; zeros init

    def test_raft_things(self, propainter_params):
        converted = convert_state_dict(zeros_state("raft_things.json"),
                                       RAFT_RULES)
        assert_tree_match(converted, propainter_params["raft"],
                          "raft-things")

    def test_recurrent_flow_completion(self, propainter_params):
        converted = convert_state_dict(
            zeros_state("recurrent_flow_completion.json"), FLOWCOMP_RULES)
        assert_tree_match(converted, propainter_params["flow_comp"],
                          "recurrent_flow_completion")

    def test_propainter_generator(self, propainter_params):
        converted = convert_state_dict(zeros_state("propainter.json"),
                                       PROPAINTER_RULES)
        assert_tree_match(converted, propainter_params["generator"],
                          "ProPainter")
