"""Video quality metrics: PSNR and SSIM.

BASELINE.md's metric list includes "PSNR/SSIM vs reference" (the CUDA
VideoVanish output is the gold standard once real checkpoints exist;
BASELINE north star: PSNR > 45 dB). These are pure-numpy reference
implementations — exact, dependency-free, and fast enough for
per-release parity runs on whole clips.

PSNR follows the standard definition on uint8 video (MAX = 255).
SSIM follows Wang et al. 2004 with the canonical parameters used by
scikit-image / MATLAB: 11x11 gaussian window, sigma = 1.5,
K1 = 0.01, K2 = 0.03, computed per channel and averaged.
"""
from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    """Peak signal-to-noise ratio between two images/videos (any shape).

    Returns +inf for identical inputs.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mse = np.mean((a - b) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    r = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(r * r) / (2.0 * sigma * sigma))
    return k / k.sum()


def _filter2_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filter over the last two axes of a 2-D
    image (float64)."""
    n = k.size
    # rows
    out = np.empty((img.shape[0], img.shape[1] - n + 1), np.float64)
    acc = np.zeros_like(out)
    for i in range(n):
        acc += k[i] * img[:, i: i + out.shape[1]]
    out = acc
    # cols
    res = np.zeros((out.shape[0] - n + 1, out.shape[1]), np.float64)
    for i in range(n):
        res += k[i] * out[i: i + res.shape[0], :]
    return res


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 255.0,
         win_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> float:
    """Mean structural similarity between two images (H,W) or (H,W,C).

    Matches scikit-image's `structural_similarity` with
    `gaussian_weights=True, use_sample_covariance=False` (the Wang et al.
    reference configuration). Channels are scored independently and
    averaged.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    if min(a.shape[0], a.shape[1]) < win_size:
        raise ValueError(f"image smaller than the {win_size}x{win_size} "
                         "SSIM window")
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    k = _gaussian_kernel(win_size, sigma)
    scores = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x = _filter2_sep(x, k)
        mu_y = _filter2_sep(y, k)
        xx = _filter2_sep(x * x, k) - mu_x * mu_x
        yy = _filter2_sep(y * y, k) - mu_y * mu_y
        xy = _filter2_sep(x * y, k) - mu_x * mu_y
        num = (2.0 * mu_x * mu_y + c1) * (2.0 * xy + c2)
        den = (mu_x * mu_x + mu_y * mu_y + c1) * (xx + yy + c2)
        scores.append(np.mean(num / den))
    return float(np.mean(scores))


def video_metrics(frames_a, frames_b, max_val: float = 255.0) -> dict:
    """Per-video PSNR/SSIM summary for two equal-length frame sequences.

    Returns {"psnr": video PSNR, "psnr_min": worst frame,
             "ssim": mean-of-frames, "ssim_min": worst frame,
             "frames": N}. "psnr" is computed from the mean MSE over ALL
    frames (the standard video PSNR), so bit-identical frames pull the
    average MSE down without turning the summary into +inf — a single
    untouched frame must not let `vv-compare --min_psnr` pass a video
    that is wrong everywhere else. It is +inf only if every frame is
    identical. "psnr_min" is still the worst single frame.
    """
    n = len(frames_a)
    if n != len(frames_b):
        raise ValueError(f"frame count mismatch: {n} vs {len(frames_b)}")
    if n == 0:
        raise ValueError("empty video")
    psnrs = np.array([psnr(frames_a[i], frames_b[i], max_val)
                      for i in range(n)])
    mses = np.array([
        np.mean((np.asarray(frames_a[i], np.float64)
                 - np.asarray(frames_b[i], np.float64)) ** 2)
        for i in range(n)])
    mean_mse = float(np.mean(mses))
    video_psnr = float("inf") if mean_mse == 0.0 else \
        float(10.0 * np.log10(max_val * max_val / mean_mse))
    ssims = np.array([ssim(frames_a[i], frames_b[i], max_val)
                      for i in range(n)])
    return {
        "psnr": video_psnr,
        "psnr_min": float(np.min(psnrs)),
        "ssim": float(np.mean(ssims)),
        "ssim_min": float(np.min(ssims)),
        "frames": n,
    }
