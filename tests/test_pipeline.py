"""Pipeline layer: colors vs cv2 ground truth, infill end-to-end (tiny
config), and the diffuerase CLI driven through its real argv surface."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import cv2

from videovanish_tpu.pipeline.colors import color_for_obj, render_colored_masks


class TestColors:
    @pytest.mark.parametrize("obj_id", list(range(1, 20)) + [37, 100, 255])
    def test_matches_cv2_hsv(self, obj_id):
        h = int((obj_id * 37) % 180)
        hsv = np.uint8([[[h, 200, 255]]])
        bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0]
        ref = tuple(int(x) for x in bgr)
        ours = color_for_obj(obj_id)
        # OpenCV rounds the HSV->BGR conversion slightly differently on
        # some hues; allow off-by-one per channel
        assert all(abs(a - b) <= 1 for a, b in zip(ours, ref)), (ours, ref)

    def test_render_overwrite_order(self):
        m1 = np.zeros((10, 10), bool); m1[2:8, 2:8] = True
        m2 = np.zeros((10, 10), bool); m2[4:6, 4:6] = True
        out = render_colored_masks({1: m1, 2: m2}, 10, 10)
        np.testing.assert_array_equal(out[5, 5], color_for_obj(2))
        np.testing.assert_array_equal(out[2, 2], color_for_obj(1))
        np.testing.assert_array_equal(out[0, 0], (0, 0, 0))

    def test_render_resizes_lowres_mask(self):
        m = np.zeros((5, 5), bool); m[2, 2] = True
        out = render_colored_masks({1: m}, 10, 10)
        assert (out != 0).any()


@pytest.fixture(scope="module")
def tiny_pipeline():
    from videovanish_tpu.config import tiny_config
    from videovanish_tpu.pipeline import infill
    infill.set_config(tiny_config())
    yield infill
    infill.set_config(None)
    infill._config = None


class TestInfillPipeline:
    def test_end_to_end_composite_semantics(self, tiny_pipeline, rng):
        T, H, W = 6, 64, 64
        frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        masks = np.zeros((T, H, W, 3), np.uint8)
        masks[:, 24:40, 24:40, 1] = 255
        out = tiny_pipeline.run_infill_on_frames(
            list(frames), list(masks), mask_dilation_iter=2, feather_px=3,
            max_img_size=64)
        assert len(out) == T and out[0].shape == (H, W, 3)
        # far from the dilated+feathered mask the original is untouched
        np.testing.assert_array_equal(out[0][:4, :4], frames[0][:4, :4])

    def test_preview_tier_caps_inference_resolution(self, tiny_pipeline,
                                                    rng, monkeypatch):
        """preview=True routes the GUI's 22-frame preview through the
        lower preview_img_size tier (interactive-latency envelope,
        BASELINE config 5) while the output stays full-resolution."""
        import dataclasses
        from videovanish_tpu.config import tiny_config
        cfg = tiny_config()
        cfg = cfg.replace(diffueraser=dataclasses.replace(
            cfg.diffueraser, preview_img_size=32))
        tiny_pipeline.set_config(cfg)
        try:
            seen = {}
            model, _ = tiny_pipeline._get_models("2-Step")
            real_forward = model.forward

            def spy(*a, **kw):
                seen["max_img_size"] = kw.get("max_img_size")
                return real_forward(*a, **kw)

            monkeypatch.setattr(model, "forward", spy)
            T, H, W = 4, 64, 64
            frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
            masks = np.zeros((T, H, W, 3), np.uint8)
            masks[:, 24:40, 24:40, 1] = 255
            out = tiny_pipeline.run_infill_on_frames(
                list(frames), list(masks), mask_dilation_iter=2,
                max_img_size=64, preview=True)
            assert seen["max_img_size"] == 32  # capped by the tier
            assert len(out) == T and out[0].shape == (H, W, 3)
        finally:
            tiny_pipeline.set_config(tiny_config())

    def test_roi_fetch_exact_vs_full(self, tiny_pipeline, rng):
        """output_roi must not change the composited result: the feathered
        alpha is 0 beyond the feather band, so out-of-ROI model output is
        discarded anyway. Same model, same seed -> the composites of the
        ROI-fetched and full-fetched outputs must be bit-identical."""
        from videovanish_tpu.ops.composite import feathered_composite
        from videovanish_tpu.ops.morphology import binarize_and_dilate
        import jax.numpy as jnp
        # 96x96 with a 16-px mask: the auto-ROI (bbox +/- margin, snapped
        # to 16) covers 64x64 < 96x96, so the ROI path is genuinely active
        T, H, W = 4, 96, 96
        frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        masks = np.zeros((T, H, W, 3), np.uint8)
        masks[:, 40:56, 40:56, 1] = 255
        model, _ = tiny_pipeline._get_models("2-Step")
        dil = binarize_and_dilate(jnp.asarray(masks), 2)
        dil_list = list(np.asarray(dil))
        full = model.forward(list(frames), dil_list, None, max_img_size=96)
        part = model.forward(list(frames), dil_list, None, max_img_size=96,
                             output_roi="auto")
        # proof the ROI was active: out-of-ROI pixels are the INPUT in the
        # ROI run but VAE-roundtripped in the full run
        np.testing.assert_array_equal(np.stack(part)[:, :8, :8], frames[:, :8, :8])
        assert not np.array_equal(np.stack(full)[:, :8, :8], frames[:, :8, :8])
        def comp(x):
            return np.asarray(feathered_composite(
                jnp.asarray(np.stack(x)), jnp.asarray(frames), dil,
                3.0, keep_unmasked_original=True))
        np.testing.assert_array_equal(comp(part), comp(full))

    def test_progress_callback_contract(self, tiny_pipeline, rng):
        calls = []

        def prog(pct, status="", **kw):
            calls.append((pct, status))

        T, H, W = 2, 64, 64
        frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        masks = np.zeros((T, H, W, 3), np.uint8)
        masks[:, 10:20, 10:20] = 255
        tiny_pipeline.run_infill_on_frames(list(frames), list(masks),
                                           max_img_size=64, prog=prog)
        pcts = [c[0] for c in calls]
        assert pcts[0] <= pcts[-1] and pcts[-1] == 100
        assert any("dilating" in c[1] for c in calls)


class TestDiffuEraseCLI:
    def test_cli_end_to_end(self, tmp_path, rng):
        from videovanish_tpu.video import write_video_frames_to_path
        T, H, W = 6, 64, 64
        frames = [(rng.random((H, W, 3)) * 255).astype(np.uint8)
                  for _ in range(T)]
        masks = []
        for _ in range(T):
            m = np.zeros((H, W, 3), np.uint8); m[20:40, 20:40] = 255
            masks.append(m)
        cv_path = str(tmp_path / "c.mkv")
        mk_path = str(tmp_path / "m.mkv")
        write_video_frames_to_path(cv_path, frames, 24.0, H, W)
        write_video_frames_to_path(mk_path, masks, 24.0, H, W)

        env = dict(os.environ, VV_CONFIG="tiny", VV_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                          "diffuerase.py"),
             "--color_video", cv_path, "--mask_video", mk_path,
             "--max_img_size", "64"],
            capture_output=True, text=True, env=env, timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        out_path = cv_path + "_vanished.mkv"
        assert os.path.exists(out_path)
        from videovanish_tpu.video import load_video_frames_from_path
        out_frames, fps = load_video_frames_from_path(out_path)
        assert len(out_frames) == T and out_frames[0].shape == (H, W, 3)
        assert fps == 24.0

    def test_cli_missing_input_errors(self, tmp_path):
        env = dict(os.environ, VV_CONFIG="tiny", VV_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                          "diffuerase.py"),
             "--color_video", str(tmp_path / "nope.mkv"),
             "--mask_video", str(tmp_path / "nope2.mkv")],
            capture_output=True, text=True, env=env, timeout=120)
        assert r.returncode != 0
        assert "input video missing" in r.stderr
