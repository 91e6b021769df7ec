"""End-to-end pipeline quality gate at tiny scale (VERDICT r2 item 5).

Composes the independent oracles into a full reference PIPELINE in
torch/numpy — VAE encode of masked frames + prior, global-index noise,
windowed PCM denoise with the motion-UNet + BrushNet torch oracles and
the f64 numpy scheduler oracle, linear cross-fade window blending, VAE
decode, cv2-chamfer feathered composite (the reference's own postprocess,
diffuerase.py:70-112) — and gates `run_infill_on_frames` against it with
`utils.quality.psnr`. This is the dress rehearsal of the BASELINE
PSNR>45 acceptance run: every pipeline seam (masking, latent-space
windows, blend ramps, ROI fetch, composite) sits between the two
implementations, while module numerics are pinned by the per-module
oracle suites.

Also measures what `brushnet_feature_reuse` (config.py, FRDiff-style
~25% denoise savings) costs against the exact reference — the on/off
decision data VERDICT r2 asked for.

The windowing/blend/scheduler/composite reference code in this file is
written from the documented formulas, not from videovanish_tpu's code.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from videovanish_tpu.core.convert import VAE_RULES, convert_state_dict
from videovanish_tpu.utils.quality import psnr

from tests.test_scheduler_oracle import (
    oracle_alphas_cumprod, oracle_lcm_timesteps, oracle_step,
)
from tests.test_unet_oracle import (
    CH, CTX, HEADS, LAYERS, TorchBrushNet, TorchUNet, _convert, gn_groups,
)

VAE_CH = (16, 16, 16, 16)  # 4 levels -> /8 latents, like SD
LATENT = 4
SCALE = 0.18215
H = W = 64
T_FRAMES = 12
CLIP, OVERLAP = 6, 2
FEATHER = 3.0


# ---------------------------------------------------------------------------
# torch VAE oracle (diffusers AutoencoderKL naming -> VAE_RULES convert)
# ---------------------------------------------------------------------------
class TorchVAEResnet(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(gn_groups(cin), cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(gn_groups(cout), cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        return (self.conv_shortcut(x) if self.conv_shortcut else x) + h


class TorchVAEAttention(tnn.Module):
    """Single-head spatial attention of the VAE mid block."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(gn_groups(c), c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).reshape(b, c, hh * ww).permute(0, 2, 1)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        a = torch.softmax(q @ k.transpose(1, 2) / (c ** 0.5), dim=-1)
        o = self.to_out[0](a @ v)
        return x + o.permute(0, 2, 1).reshape(b, c, hh, ww)


def _mid_block(c):
    m = tnn.Module()
    m.resnets = tnn.ModuleList([TorchVAEResnet(c, c), TorchVAEResnet(c, c)])
    m.attentions = tnn.ModuleList([TorchVAEAttention(c)])
    return m


class TorchVAE(tnn.Module):
    """AutoencoderKL at tiny size; encode() returns the latent mean."""

    def __init__(self, chans=VAE_CH, latent=LATENT):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList()
        prev = chans[0]
        for i, c in enumerate(chans):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TorchVAEResnet(prev if j == 0 else c, c) for j in range(2)])
            prev = c
            if i < len(chans) - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)
                blk.downsamplers = tnn.ModuleList([ds])
            enc.down_blocks.append(blk)
        enc.mid_block = _mid_block(chans[-1])
        enc.conv_norm_out = tnn.GroupNorm(gn_groups(chans[-1]), chans[-1],
                                          eps=1e-6)
        enc.conv_out = tnn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        rev = tuple(reversed(chans))
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = _mid_block(rev[0])
        dec.up_blocks = tnn.ModuleList()
        prev = rev[0]
        for i, c in enumerate(rev):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TorchVAEResnet(prev if j == 0 else c, c)
                 for j in range(3)])
            prev = c
            if i < len(rev) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = tnn.GroupNorm(gn_groups(rev[-1]), rev[-1],
                                          eps=1e-6)
        dec.conv_out = tnn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)

    def encode(self, x):
        enc = self.encoder
        h = enc.conv_in(x)
        for i, blk in enumerate(enc.down_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))  # diffusers asymmetric pad
                h = blk.downsamplers[0].conv(h)
        h = enc.mid_block.resnets[0](h)
        h = enc.mid_block.attentions[0](h)
        h = enc.mid_block.resnets[1](h)
        h = enc.conv_out(F.silu(enc.conv_norm_out(h)))
        mean, _ = self.quant_conv(h).chunk(2, dim=1)
        return mean

    def decode(self, z):
        dec = self.decoder
        h = dec.conv_in(self.post_quant_conv(z))
        h = dec.mid_block.resnets[0](h)
        h = dec.mid_block.attentions[0](h)
        h = dec.mid_block.resnets[1](h)
        for i, blk in enumerate(dec.up_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return dec.conv_out(F.silu(dec.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# reference pipeline pieces (documented formulas, written independently)
# ---------------------------------------------------------------------------
def ref_windows(n, clip, ov):
    if n <= clip:
        return [(0, n)]
    stride, out, s = clip - ov, [], 0
    while True:
        if s + clip >= n:
            out.append((n - clip, clip))
            return out
        out.append((s, clip))
        s += stride


def ref_blend_weights(length, ov, is_first, is_last):
    w = np.ones(length, np.float32)
    if ov > 0:
        ramp = (np.arange(ov) + 1.0) / (ov + 1.0)
        if not is_first:
            w[:ov] = ramp
        if not is_last:
            w[-ov:] = ramp[::-1]
    return w


def ref_composite(inpainted_u8, original_u8, mask_bool, feather):
    """The reference's own postprocess: two cv2 DIST_L2/5 chamfer
    transforms -> alpha = clip(0.5 + (d_in - d_out) / (2*feather))."""
    import cv2
    out = np.empty_like(original_u8)
    for i in range(original_u8.shape[0]):
        m = mask_bool[i].astype(np.uint8)
        d_in = cv2.distanceTransform(m, cv2.DIST_L2, 5)
        d_out = cv2.distanceTransform(1 - m, cv2.DIST_L2, 5)
        alpha = np.clip(0.5 + (d_in - d_out) / (2.0 * feather), 0.0, 1.0)
        blend = alpha[..., None] * inpainted_u8[i].astype(np.float32) \
            + (1.0 - alpha[..., None]) * original_u8[i].astype(np.float32)
        out[i] = np.clip(np.rint(blend), 0, 255).astype(np.uint8)
    return out


def torch_reference_pipeline(tvae, tu, tb, frames, masks, prior, noise,
                             null_emb, clip=None, ov=None,
                             enc_chunk: int = 0):
    """Full reference run: masked VAE encode -> windowed PCM denoise ->
    blend -> decode -> feathered composite. All f32/f64 torch/numpy.
    clip/ov default to the module's tiny geometry; enc_chunk>0 runs the
    VAE in chunks of that many frames (memory control at production
    geometry, where the mid-block attention matrix scales with T)."""
    clip = CLIP if clip is None else clip
    ov = OVERLAP if ov is None else ov
    acp = oracle_alphas_cumprod()
    steps = oracle_lcm_timesteps(2)
    m = (masks > 0)
    x01 = frames.astype(np.float32) / 255.0
    masked01 = x01 * (1.0 - m[..., None].astype(np.float32))
    prior01 = prior.astype(np.float32) / 255.0

    def enc(batch01):
        n = enc_chunk or batch01.shape[0]
        outs = []
        for i in range(0, batch01.shape[0], n):
            with torch.no_grad():
                z = tvae.encode(torch.from_numpy(
                    (batch01[i:i + n] * 2.0 - 1.0)
                    .transpose(0, 3, 1, 2).copy()))
            outs.append(z.numpy() * SCALE)
        return np.concatenate(outs)  # (T, 4, h8, w8)

    lat_masked = enc(masked01)
    lat_prior = enc(prior01)
    # latent-res mask: the rect is 8-aligned, so any nearest policy agrees
    m_lat = m[:, ::8, ::8].astype(np.float32)[:, None]

    Tn = frames.shape[0]
    acc = np.zeros_like(lat_prior, dtype=np.float64)
    wsum = np.zeros((Tn, 1, 1, 1), np.float64)
    plan = ref_windows(Tn, clip, ov)
    for wi, (s, L) in enumerate(plan):
        x = np.sqrt(acp[steps[0]]) * lat_prior[s:s + L] \
            + np.sqrt(1.0 - acp[steps[0]]) \
            * noise[s:s + L].transpose(0, 3, 1, 2)
        ctx = torch.from_numpy(np.repeat(null_emb[None], L, 0))
        for i, t_i in enumerate(steps):
            t_vec = torch.tensor([t_i] * L)
            bsample = np.concatenate(
                [x.astype(np.float32), lat_masked[s:s + L], m_lat[s:s + L]],
                axis=1)
            with torch.no_grad():
                down, mid, up = tb(torch.from_numpy(bsample), t_vec, ctx)
                inject = {"down": down, "mid": mid, "up": up}
                eps = tu(torch.from_numpy(x.astype(np.float32)), t_vec, ctx,
                         inject=inject, num_frames=L).numpy()
            t_next = steps[i + 1] if i + 1 < len(steps) else -1
            x = oracle_step(acp, x, eps, t_i, t_next)
        bw = ref_blend_weights(L, ov, wi == 0, wi == len(plan) - 1)
        acc[s:s + L] += bw[:, None, None, None] * x
        wsum[s:s + L] += bw[:, None, None, None]

    z = (acc / wsum).astype(np.float32)
    with torch.no_grad():
        rgb = tvae.decode(torch.from_numpy(z / SCALE)).numpy()
    x01 = np.clip((rgb.transpose(0, 2, 3, 1) + 1.0) / 2.0, 0.0, 1.0)
    dec_u8 = np.clip(np.rint(x01 * 255.0), 0, 255).astype(np.uint8)
    return ref_composite(dec_u8, frames, m, FEATHER)


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------
def _tiny_dcfg(**kw):
    from videovanish_tpu.config import DiffuEraserConfig
    base = dict(
        max_img_size=H, clip_length=CLIP, clip_overlap=OVERLAP,
        block_out_channels=CH, layers_per_block=LAYERS,
        cross_attention_dim=CTX, attention_head_dim=HEADS,
        vae_block_out_channels=VAE_CH)
    base.update(kw)  # geometry overrides (production-geometry gate)
    return DiffuEraserConfig(**base)


@pytest.fixture(scope="module")
def oracle_models():
    torch.manual_seed(3)
    tvae = TorchVAE().eval()
    tu = TorchUNet(motion=True).eval()
    tb = TorchBrushNet().eval()
    return tvae, tu, tb


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    # smooth-ish frames (random low-freq) + an 8-aligned rect mask
    base = rng.integers(0, 255, (T_FRAMES, H // 8, W // 8, 3), np.uint8)
    frames = np.repeat(np.repeat(base, 8, 1), 8, 2)
    masks = np.zeros((T_FRAMES, H, W), np.uint8)
    masks[:, 16:32, 24:48] = 255
    prior = np.repeat(np.repeat(
        rng.integers(0, 255, (T_FRAMES, H // 16, W // 16, 3), np.uint8),
        16, 1), 16, 2)
    return frames, masks, prior


@pytest.fixture(scope="module")
def converted_params(oracle_models):
    tvae, tu, tb = oracle_models
    rng = np.random.default_rng(11)
    null_emb = rng.standard_normal((77, CTX)).astype(np.float32) * 0.1
    params = {
        "vae": convert_state_dict(
            {k: v for k, v in tvae.state_dict().items()}, VAE_RULES),
        "unet": _convert(tu),
        "brushnet": _convert(tb),
        "null_text_emb": jnp.asarray(null_emb),
    }
    return params, null_emb


def _noise_like_model(seed, t_frames, h=None, w=None):
    base_key = jax.random.PRNGKey(seed)
    h, w = (H if h is None else h), (W if w is None else w)
    return np.asarray(jax.vmap(lambda i: jax.random.normal(
        jax.random.fold_in(base_key, i), (h // 8, w // 8, LATENT),
        jnp.float32))(jnp.arange(t_frames)))


def _install_pipeline_model(dcfg, params):
    """Install a DiffuEraser with oracle-converted params as the
    pipeline's lazy singleton (the reference's own global-model pattern,
    diffuerase.py:15-18)."""
    from videovanish_tpu.config import VVConfig
    from videovanish_tpu.models.diffueraser import DiffuEraser
    import videovanish_tpu.pipeline.infill as infill
    model = DiffuEraser(config=dcfg, params=params, seed=0)
    infill.set_config(VVConfig(diffueraser=dcfg))
    infill.video_inpainting_sd = model
    infill.last_ckpt = "2-Step"
    infill.propainter = object()  # prior is passed in; never called
    return infill


def _restore(infill):
    """Reset the pipeline singletons to the suite's tiny config."""
    from videovanish_tpu.config import tiny_config
    infill.set_config(tiny_config())


class TestEndToEndQuality:
    def test_pipeline_matches_torch_reference(self, oracle_models, scene,
                                              converted_params):
        tvae, tu, tb = oracle_models
        frames, masks, prior = scene
        params, null_emb = converted_params
        noise = _noise_like_model(0, T_FRAMES)
        ref = torch_reference_pipeline(tvae, tu, tb, frames, masks, prior,
                                       noise, null_emb)

        # exact numerics gate: pin reuse off (the ship default is True;
        # its cost is measured separately below)
        infill = _install_pipeline_model(
            _tiny_dcfg(brushnet_feature_reuse=False), params)
        try:
            out = infill.run_infill_on_frames(
                [frames[i] for i in range(T_FRAMES)],
                [masks[i] for i in range(T_FRAMES)],
                mask_dilation_iter=0,
                propainer_frames=[prior[i] for i in range(T_FRAMES)],
                max_img_size=H, feather_px=int(FEATHER))
        finally:
            _restore(infill)
        got = np.stack(out)

        # untouched pixels are bit-identical (keep_unmasked_original)
        far = np.ones((H, W), bool)
        far[:48, :64] = False  # generous margin around the mask+feather
        assert np.array_equal(got[:, far], frames[:, far])

        value = psnr(got, ref)
        print(f"\n[e2e quality] PSNR vs torch reference: {value:.2f} dB")
        assert value > 45.0, f"e2e PSNR {value:.2f} <= 45 dB"

    def test_brushnet_feature_reuse_cost(self, oracle_models, scene,
                                         converted_params):
        """Measure the FRDiff-style reuse approximation against the exact
        reference — the data deciding config.brushnet_feature_reuse."""
        tvae, tu, tb = oracle_models
        frames, masks, prior = scene
        params, null_emb = converted_params
        noise = _noise_like_model(0, T_FRAMES)
        ref = torch_reference_pipeline(tvae, tu, tb, frames, masks, prior,
                                       noise, null_emb)

        infill = _install_pipeline_model(
            _tiny_dcfg(brushnet_feature_reuse=True), params)
        try:
            out = infill.run_infill_on_frames(
                [frames[i] for i in range(T_FRAMES)],
                [masks[i] for i in range(T_FRAMES)],
                mask_dilation_iter=0,
                propainer_frames=[prior[i] for i in range(T_FRAMES)],
                max_img_size=H, feather_px=int(FEATHER))
        finally:
            _restore(infill)
        value = psnr(np.stack(out), ref)
        print(f"\n[e2e quality] brushnet_feature_reuse PSNR vs exact: "
              f"{value:.2f} dB")
        # Measured 56.4 dB on 2026-08-19 — comfortably above the 45 dB
        # e2e gate, which is the data behind brushnet_feature_reuse=True
        # in config.py. Gate at the same 45 dB bar as the exact path so a
        # regression in the reuse approximation fails loudly.
        assert value > 45.0, f"reuse PSNR {value:.2f} <= 45 dB"

    def test_prior_sweep_properties(self, oracle_models, scene,
                                    converted_params):
        """Prior sweep (VERDICT r4 item 7): exercise the prior-injection
        seam (latent init sqrt(acp[t0])*enc(prior) + noise,
        diffuerase.py:62-67) at an adversarial extreme instead of only
        the fixture's random prior. With random weights the output
        CANNOT be closer to a better prior — at t0=999 the prior is ~7%
        of the init amplitude, and recovering it requires the UNet to
        cancel the injected noise, which only trained weights do
        (measured: 9.47 vs 9.48 dB to-frames for perfect vs inverted
        prior) — so the testable properties are: (a) the implementation
        still matches the torch oracle at the extreme prior (a scale /
        clip / sign bug in prior handling diverges the two pipelines'
        inits), (b) the prior DOES reach the masked output (runs with
        different priors differ inside the mask), and (c) composite
        locality: a prior change never leaks outside the feathered mask
        (runs bit-identical there)."""
        tvae, tu, tb = oracle_models
        frames, masks, _ = scene
        params, null_emb = converted_params
        noise = _noise_like_model(0, T_FRAMES)
        bad_prior = (255 - frames).astype(np.uint8)

        ref_bad = torch_reference_pipeline(tvae, tu, tb, frames, masks,
                                           bad_prior, noise, null_emb)

        infill = _install_pipeline_model(
            _tiny_dcfg(brushnet_feature_reuse=False,
                       spatial_attn_reuse=False), params)
        outs = {}
        try:
            for name, prior in (("good", frames), ("bad", bad_prior)):
                out = infill.run_infill_on_frames(
                    [frames[i] for i in range(T_FRAMES)],
                    [masks[i] for i in range(T_FRAMES)],
                    mask_dilation_iter=0,
                    propainer_frames=[prior[i] for i in range(T_FRAMES)],
                    max_img_size=H, feather_px=int(FEATHER))
                outs[name] = np.stack(out)
        finally:
            _restore(infill)

        value = psnr(outs["bad"], ref_bad)
        print(f"\n[e2e quality] adversarial-prior PSNR vs torch "
              f"reference: {value:.2f} dB")
        assert value > 45.0, \
            f"adversarial-prior e2e PSNR {value:.2f} <= 45 dB"

        far = np.ones((H, W), bool)
        far[:48, :64] = False  # mask box + generous feather margin
        assert np.array_equal(outs["good"][:, far], outs["bad"][:, far]), \
            "prior change leaked outside the feathered mask region"
        box = (slice(None), slice(16, 32), slice(24, 48))
        assert not np.array_equal(outs["good"][box], outs["bad"][box]), \
            "prior change never reached the masked output"

    def test_spatial_attn_reuse_cost(self, oracle_models, scene,
                                     converted_params):
        """Measure the TGATE/DeepCache-style cross-step attention reuse
        against the exact reference — the data behind
        config.spatial_attn_reuse's default (ON since round 5: 56.38 dB
        here and 75.5 dB on-vs-off at production geometry,
        test_e2e_quality_prod.py). The flag ships ON, so the reuse path
        is held to the same 45 dB e2e bar as the exact path; the
        off-vs-on inequality pins that the flag actually changes the
        computation (replay really wired)."""
        tvae, tu, tb = oracle_models
        frames, masks, prior = scene
        params, null_emb = converted_params
        noise = _noise_like_model(0, T_FRAMES)
        ref = torch_reference_pipeline(tvae, tu, tb, frames, masks, prior,
                                       noise, null_emb)

        values = {}
        for flag in (False, True):
            infill = _install_pipeline_model(
                _tiny_dcfg(spatial_attn_reuse=flag), params)
            try:
                out = infill.run_infill_on_frames(
                    [frames[i] for i in range(T_FRAMES)],
                    [masks[i] for i in range(T_FRAMES)],
                    mask_dilation_iter=0,
                    propainer_frames=[prior[i] for i in range(T_FRAMES)],
                    max_img_size=H, feather_px=int(FEATHER))
            finally:
                _restore(infill)
            values[flag] = psnr(np.stack(out), ref)
        print(f"\n[e2e quality] spatial_attn_reuse PSNR vs exact: "
              f"off={values[False]:.2f} dB on={values[True]:.2f} dB")
        assert values[True] != values[False], \
            "spatial_attn_reuse flag changed nothing - replay not wired"
        # the ship default is ON — hold the reuse path to the same 45 dB
        # bar that decided it (measured 56.38 dB, 2026-08-21)
        assert values[True] > 45.0, \
            f"attn reuse PSNR {values[True]:.2f} <= 45 dB"
