"""utils/quality.py: PSNR/SSIM reference implementations.

SSIM is gated by a brute-force (non-separable, per-window loop) oracle
implemented independently here from Wang et al. 2004, so a bug in the
separable filtering or constant handling cannot self-validate.
"""
import numpy as np
import pytest

from videovanish_tpu.utils.quality import (
    psnr, ssim, video_metrics, _gaussian_kernel,
)


def test_psnr_identical_is_inf():
    img = np.random.default_rng(0).integers(0, 256, (32, 33, 3), np.uint8)
    assert psnr(img, img) == float("inf")


def test_psnr_closed_form():
    a = np.zeros((16, 16), np.uint8)
    b = np.full((16, 16), 16, np.uint8)  # mse = 256
    assert psnr(a, b) == pytest.approx(10 * np.log10(255.0 ** 2 / 256.0))


def test_psnr_shape_mismatch():
    with pytest.raises(ValueError):
        psnr(np.zeros((4, 4)), np.zeros((4, 5)))


def _ssim_bruteforce(x, y, max_val=255.0, win=11, sigma=1.5):
    """Independent SSIM: explicit 2-D gaussian window, per-window loop."""
    k1d = _gaussian_kernel(win, sigma)
    w = np.outer(k1d, k1d)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    H, W = x.shape
    vals = []
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            px = x[i:i + win, j:j + win]
            py = y[i:i + win, j:j + win]
            mx = (w * px).sum()
            my = (w * py).sum()
            vx = (w * px * px).sum() - mx * mx
            vy = (w * py * py).sum() - my * my
            cxy = (w * px * py).sum() - mx * my
            vals.append(((2 * mx * my + c1) * (2 * cxy + c2))
                        / ((mx * mx + my * my + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_ssim_matches_bruteforce_oracle():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (20, 24), np.uint8)
    y = np.clip(x.astype(np.int32)
                + rng.integers(-30, 31, x.shape), 0, 255).astype(np.uint8)
    assert ssim(x, y) == pytest.approx(_ssim_bruteforce(x, y), abs=1e-10)


def test_ssim_identical_is_one_and_ordering():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, (24, 24, 3), np.uint8)
    assert ssim(x, x) == pytest.approx(1.0)
    small = np.clip(x.astype(np.int32)
                    + rng.integers(-5, 6, x.shape), 0, 255).astype(np.uint8)
    big = np.clip(x.astype(np.int32)
                  + rng.integers(-80, 81, x.shape), 0, 255).astype(np.uint8)
    assert 1.0 > ssim(x, small) > ssim(x, big)


def test_ssim_rejects_tiny_images():
    with pytest.raises(ValueError):
        ssim(np.zeros((8, 8)), np.zeros((8, 8)))


def test_video_metrics_summary():
    rng = np.random.default_rng(3)
    a = [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(3)]
    b = [np.clip(f.astype(np.int32) + rng.integers(-10, 11, f.shape),
                 0, 255).astype(np.uint8) for f in a]
    m = video_metrics(a, b)
    assert m["frames"] == 3
    assert m["psnr_min"] <= m["psnr"]
    assert m["ssim_min"] <= m["ssim"]
    assert 0.0 < m["ssim"] <= 1.0
    with pytest.raises(ValueError):
        video_metrics(a, b[:2])


def test_video_metrics_identical_frame_does_not_hide_bad_frames():
    # Regression: a single bit-identical frame must not turn the video
    # PSNR into +inf (it would let `vv-compare --min_psnr` pass a video
    # that is wrong everywhere else). Video PSNR comes from mean MSE.
    good = np.full((16, 16, 3), 128, np.uint8)
    bad = np.zeros((16, 16, 3), np.uint8)
    m = video_metrics([good, good], [good, bad])  # frame 0 identical
    assert np.isfinite(m["psnr"])
    assert m["psnr"] < 20.0  # dominated by the wrong frame
    assert m["psnr_min"] < 20.0
    m_all_same = video_metrics([good, good], [good, good])
    assert m_all_same["psnr"] == float("inf")
