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
