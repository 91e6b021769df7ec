"""Unit tests for image-processing ops vs scipy/cv2 ground truth
(SURVEY.md §4: dilation, feather alpha math, resize, compositing)."""
import numpy as np
import pytest

import cv2
import scipy.ndimage

import jax.numpy as jnp

from videovanish_tpu.ops.morphology import binary_dilation, binarize_and_dilate
from videovanish_tpu.ops.edt import chamfer_distance, feather_alpha
from videovanish_tpu.ops.resize import resize_nearest, resize_bilinear, plan_long_side
from videovanish_tpu.ops.composite import feathered_composite


def random_mask(rng, h=40, w=56, p=0.02):
    return (rng.random((h, w)) < p)


class TestDilation:
    @pytest.mark.parametrize("iters", [0, 1, 3, 8])
    def test_matches_scipy(self, rng, iters):
        m = random_mask(rng)
        ours = np.asarray(binary_dilation(jnp.asarray(m), iters))
        ref = scipy.ndimage.binary_dilation(m, iterations=iters) if iters > 0 else m
        np.testing.assert_array_equal(ours, ref)

    def test_batched(self, rng):
        m = np.stack([random_mask(rng) for _ in range(3)])
        ours = np.asarray(binary_dilation(jnp.asarray(m), 2))
        for i in range(3):
            ref = scipy.ndimage.binary_dilation(m[i], iterations=2)
            np.testing.assert_array_equal(ours[i], ref)

    def test_binarize_and_dilate_rgb(self, rng):
        rgb = np.zeros((20, 20, 3), np.uint8)
        rgb[5, 5, 1] = 7  # any channel > 0 counts (diffuerase.py:29)
        out = np.asarray(binarize_and_dilate(jnp.asarray(rgb), 1))
        assert out.dtype == np.uint8
        assert set(np.unique(out)) <= {0, 255}
        assert out[5, 5] == 255 and out[5, 6] == 255 and out[6, 6] == 0


class TestChamfer:
    def test_matches_cv2_within_band(self, rng):
        m = random_mask(rng, 48, 64, p=0.05)
        m = scipy.ndimage.binary_dilation(m, iterations=2)
        ref = cv2.distanceTransform((m * 255).astype(np.uint8), cv2.DIST_L2, 5)
        ours = np.asarray(chamfer_distance(jnp.asarray(m), iterations=4))
        band = ref < 6.0  # truncation radius for 4 iterations is ~8px
        np.testing.assert_allclose(ours[band], ref[band], atol=2e-3)

    def test_feather_alpha_matches_reference_formula(self, rng):
        m = random_mask(rng, 48, 64, p=0.05)
        m = scipy.ndimage.binary_dilation(m, iterations=3)
        fpx = 3.0
        m_bin = (m * 255).astype(np.uint8)
        d_in = cv2.distanceTransform(m_bin, cv2.DIST_L2, 5)
        d_out = cv2.distanceTransform(cv2.bitwise_not(m_bin), cv2.DIST_L2, 5)
        ref = np.clip(0.5 + (d_in - d_out) / (2 * fpx), 0, 1)
        ours = np.asarray(feather_alpha(jnp.asarray(m), fpx))
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_feather_zero_is_hard_mask(self, rng):
        m = random_mask(rng)
        ours = np.asarray(feather_alpha(jnp.asarray(m), 0))
        np.testing.assert_array_equal(ours, m.astype(np.float32))


class TestResize:
    @pytest.mark.parametrize("shape,out", [((37, 53), (20, 30)), ((20, 30), (37, 53))])
    def test_nearest_matches_cv2(self, rng, shape, out):
        img = (rng.random((*shape, 3)) * 255).astype(np.uint8)
        ref = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_NEAREST)
        ours = np.asarray(resize_nearest(jnp.asarray(img), *out))
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("shape,out", [((36, 52), (20, 32)), ((20, 32), (48, 60))])
    def test_bilinear_close_to_cv2(self, rng, shape, out):
        img = rng.random((*shape, 3)).astype(np.float32)
        ref = cv2.resize(img, (out[1], out[0]), interpolation=cv2.INTER_LINEAR)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), *out))
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_plan_long_side(self):
        assert plan_long_side(720, 1280, 960) == (544, 960)
        assert plan_long_side(100, 100, 960) == (104, 104) or \
            plan_long_side(100, 100, 960)[0] % 8 == 0


class TestComposite:
    def _reference_composite(self, inpainted, original, mask, feather_px):
        """Direct port of diffuerase.py:70-112 math (with the early-return
        bug fixed: every frame composited)."""
        H0, W0 = original.shape[1:3]
        out = []
        for i in range(len(inpainted)):
            f = inpainted[i]
            if f.shape[:2] != (H0, W0):
                f = cv2.resize(f, (W0, H0))
            m = mask[i]
            if m.ndim == 3:
                m = np.any(m > 0, axis=2).astype(np.uint8)
            else:
                m = (m > 0).astype(np.uint8)
            if m.shape[:2] != (H0, W0):
                m = cv2.resize(m, (W0, H0), interpolation=cv2.INTER_NEAREST)
            _, m_bin = cv2.threshold(m, 0, 255, cv2.THRESH_BINARY)
            inv = cv2.bitwise_not(m_bin)
            if feather_px > 0:
                d_in = cv2.distanceTransform(m_bin, cv2.DIST_L2, 5)
                d_out = cv2.distanceTransform(inv, cv2.DIST_L2, 5)
                alpha = np.clip(0.5 + (d_in - d_out) / (2.0 * feather_px), 0, 1)
            else:
                alpha = (m_bin > 0).astype(np.float32)
            a3 = alpha[..., None]
            out.append(np.clip(np.rint(a3 * f.astype(np.float32)
                                       + (1 - a3) * original[i].astype(np.float32)),
                               0, 255).astype(np.uint8))
        return np.stack(out)

    def test_same_resolution(self, rng):
        T, H, W = 3, 40, 56
        inp = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        orig = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        m = np.stack([scipy.ndimage.binary_dilation(random_mask(rng, H, W), iterations=3)
                      for _ in range(T)]).astype(np.uint8) * 255
        ref = self._reference_composite(inp, orig, m, 3.0)
        ours = np.asarray(feathered_composite(
            jnp.asarray(inp), jnp.asarray(orig), jnp.asarray(m), 3.0))
        # alpha parity is ~1e-3 -> allow off-by-one from rint at ties
        assert np.mean(np.abs(ours.astype(int) - ref.astype(int)) > 1) < 1e-3
        assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1

    def test_no_keep_returns_inpainted(self, rng):
        T, H, W = 2, 16, 16
        inp = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        orig = np.zeros_like(inp)
        m = np.ones((T, H, W), np.uint8)
        ours = np.asarray(feathered_composite(
            jnp.asarray(inp), jnp.asarray(orig), jnp.asarray(m), 3.0,
            keep_unmasked_original=False))
        np.testing.assert_array_equal(ours, inp)


class TestYUV420:
    """I420 wire format (ops/colorspace.py): host cv2 encode -> device
    BT.601 inverse. Error budget = chroma subsample + u8 quantization."""

    def _smooth(self, rng, n=2, h=48, w=64):
        # smooth gradients: representative of video content (chroma
        # subsampling error concentrates on sharp chroma edges)
        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        fr = np.stack([
            np.stack([50 + yy * 2 + i * 10, 200 - xx, 80 + yy + xx],
                     axis=-1) for i in range(n)])
        return np.clip(fr, 0, 255).astype(np.uint8)

    def test_roundtrip_matches_cv2_inverse(self, rng):
        """Our device decode == cv2's own I420->RGB to ~1/255."""
        from videovanish_tpu.ops.colorspace import (
            rgb_to_yuv420_host, yuv420_to_rgb01)
        fr = self._smooth(rng)
        yuv = rgb_to_yuv420_host(fr)
        ours = np.asarray(yuv420_to_rgb01(jnp.asarray(yuv))) * 255.0
        ref = np.stack([cv2.cvtColor(yuv[i], cv2.COLOR_YUV2RGB_I420)
                        for i in range(len(yuv))]).astype(np.float32)
        assert np.abs(ours - ref).max() <= 2.0

    def test_roundtrip_error_bounded(self, rng):
        from videovanish_tpu.ops.colorspace import (
            rgb_to_yuv420_host, yuv420_to_rgb01)
        fr = self._smooth(rng)
        back = np.asarray(yuv420_to_rgb01(
            jnp.asarray(rgb_to_yuv420_host(fr)))) * 255.0
        err = np.abs(back - fr.astype(np.float32))
        assert err.max() <= 6.0 and err.mean() <= 1.5

    def test_numpy_fallback_agrees_with_cv2(self, rng):
        """The no-cv2 fallback implements the same transform."""
        import videovanish_tpu.ops.colorspace as cs
        fr = self._smooth(rng)
        a = cs.rgb_to_yuv420_host(fr).astype(np.int16)

        real_import = __builtins__["__import__"] if isinstance(
            __builtins__, dict) else __builtins__.__import__

        def no_cv2(name, *args, **kw):
            if name == "cv2":
                raise ImportError("forced")
            return real_import(name, *args, **kw)

        import builtins
        orig = builtins.__import__
        builtins.__import__ = no_cv2
        try:
            b = cs.rgb_to_yuv420_host(fr).astype(np.int16)
        finally:
            builtins.__import__ = orig
        assert np.abs(a - b).max() <= 2

    def test_model_forward_yuv_close_to_rgb(self, rng, monkeypatch):
        """End-to-end: tiny DiffuEraser output with VV_UPLOAD=yuv420 is
        visually identical to the exact RGB upload path."""
        from videovanish_tpu.config import tiny_config
        from videovanish_tpu.models.diffueraser import DiffuEraser
        from videovanish_tpu.utils.quality import psnr
        cfg = tiny_config().diffueraser
        m = DiffuEraser(config=cfg, ckpt="2-Step")
        fr = self._smooth(rng, n=6, h=64, w=64)
        masks = np.zeros((6, 64, 64), np.uint8)
        masks[:, 20:40, 20:44] = 1
        frames = [fr[i] for i in range(6)]
        ms = [masks[i] for i in range(6)]
        monkeypatch.setenv("VV_UPLOAD", "rgb")
        ref = np.stack(m.forward(frames, ms, max_img_size=64))
        monkeypatch.setenv("VV_UPLOAD", "yuv420")
        out = np.stack(m.forward(frames, ms, max_img_size=64))
        assert psnr(out, ref) > 35.0
