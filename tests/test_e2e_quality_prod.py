"""Production-GEOMETRY e2e quality gate (VERDICT r3 item 7).

test_e2e_quality.py proves the full pipeline (masking, latent windows,
blend ramps, ROI fetch, feathered composite) against a composed torch/
numpy reference — but at 64x64. Blend ramps, ROI snapping
(models/diffueraser/model.py) and the YUV420 wire all scale with
resolution, so this runs the SAME gate once at the reference's real
serving geometry (BASELINE.md config 4): 960 long side (544x960 — what a
720p input resizes to, videovanish.py:1215), clip_length 22, overlap 4,
two overlapping windows, a localized mask that engages the ROI-snap
path. Channels stay tiny (the per-module oracle suites own numerics at
production widths); geometry is what changes here.

Slow-marked: ~the longest single test in the suite (torch oracle at
544x960 on 1 CPU core).
"""
from __future__ import annotations

import numpy as np
import pytest

from videovanish_tpu.utils.quality import psnr

from tests.test_e2e_quality import (
    FEATHER, _install_pipeline_model, _noise_like_model,
    _restore, _tiny_dcfg, converted_params, oracle_models,  # noqa: F401
    torch_reference_pipeline,
)

PH, PW = 256, 960       # real 960 long side (what max_img_size pins);
                        # 256 rows keep the CPU oracle's XLA attention
                        # buffers (O(tokens^2) at 120x32 latent tokens)
                        # inside host RAM — 544x960 needs 142 GB
PT = 24                 # 2 windows: (0,22) + (2,22)
PCLIP, POV = 22, 4      # production window geometry (config.py defaults)


@pytest.fixture(scope="module")
def prod_scene():
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (PT, PH // 8, PW // 8, 3), np.uint8)
    frames = np.repeat(np.repeat(base, 8, 1), 8, 2)
    # localized 8-aligned rect -> engages the ROI snap/fetch path
    masks = np.zeros((PT, PH, PW), np.uint8)
    masks[:, 80:176, 320:576] = 255
    prior = np.repeat(np.repeat(
        rng.integers(0, 255, (PT, PH // 16, PW // 16, 3), np.uint8),
        16, 1), 16, 2)
    return frames, masks, prior


class TestProductionGeometryQuality:
    def test_pipeline_matches_torch_reference_at_960(
            self, oracle_models, prod_scene, converted_params):
        tvae, tu, tb = oracle_models
        frames, masks, prior = prod_scene
        params, null_emb = converted_params
        noise = _noise_like_model(0, PT, h=PH, w=PW)
        ref = torch_reference_pipeline(
            tvae, tu, tb, frames, masks, prior, noise, null_emb,
            clip=PCLIP, ov=POV, enc_chunk=8)

        infill = _install_pipeline_model(
            _tiny_dcfg(brushnet_feature_reuse=False, max_img_size=960,
                       clip_length=PCLIP, clip_overlap=POV), params)
        try:
            out = infill.run_infill_on_frames(
                [frames[i] for i in range(PT)],
                [masks[i] for i in range(PT)],
                mask_dilation_iter=0,
                propainer_frames=[prior[i] for i in range(PT)],
                max_img_size=960, feather_px=int(FEATHER))
        finally:
            _restore(infill)
        got = np.stack(out)

        # untouched pixels bit-identical at production geometry
        far = np.ones((PH, PW), bool)
        far[48:208, 288:608] = False  # mask + feather + margin
        assert np.array_equal(got[:, far], frames[:, far])

        value = psnr(got, ref)
        print(f"\n[e2e quality @960] PSNR vs torch reference: "
              f"{value:.2f} dB")
        assert value > 45.0, f"960-geometry e2e PSNR {value:.2f} <= 45 dB"

    def test_spatial_attn_reuse_delta_at_960(self, prod_scene,
                                             converted_params):
        """Approximation error of cfg.spatial_attn_reuse at production
        geometry, measured directly as PSNR(on, off) — no torch oracle
        needed: the exact path is itself oracle-gated above, so the
        on-vs-off delta isolates what the reuse changes. This is the
        decision data for the config default (tiny-geometry companion:
        test_e2e_quality.py::test_spatial_attn_reuse_cost)."""
        frames, masks, prior = prod_scene
        params, _ = converted_params
        outs = {}
        for flag in (False, True):
            infill = _install_pipeline_model(
                _tiny_dcfg(spatial_attn_reuse=flag, max_img_size=960,
                           clip_length=PCLIP, clip_overlap=POV), params)
            try:
                out = infill.run_infill_on_frames(
                    [frames[i] for i in range(PT)],
                    [masks[i] for i in range(PT)],
                    mask_dilation_iter=0,
                    propainer_frames=[prior[i] for i in range(PT)],
                    max_img_size=960, feather_px=int(FEATHER))
            finally:
                _restore(infill)
            outs[flag] = np.stack(out)
        assert not np.array_equal(outs[True], outs[False]), \
            "spatial_attn_reuse flag changed nothing - replay not wired"
        value = psnr(outs[True], outs[False])
        print(f"\n[e2e quality @960] spatial_attn_reuse on-vs-off: "
              f"{value:.2f} dB")
        # sanity floor only while the default is OFF; > 45 dB here plus
        # the tiny-geometry oracle number is the case for flipping it ON
        assert value > 20.0, f"attn reuse unusable at 960: {value:.2f} dB"
