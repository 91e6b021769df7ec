"""Property tests around the window/chunk seam math (VERDICT r4 item 7).

The DiffuEraser composition oracle (tests/test_e2e_quality.py) is
hand-written by the same author as the implementation, so a shared
misreading of window blending could pass both sides. These tests pin the
blend/plan layer to properties that hold regardless of either
implementation's reading:

  - every frame is covered with positive total weight for any plan;
  - blending windows that agree (the global-index-noise guarantee,
    models/diffueraser/model.py "noise is a pure function of the GLOBAL
    frame index") reproduces their common value exactly, for ANY window
    plan — this is the mathematical fact behind window-count invariance
    and chunk-count invariance;
  - overlap ramps are oriented (earlier window fades out, later fades
    in): a flipped ramp or off-by-one window start fails;
  - the 2-chunk carry accumulation (withheld tail acc/wsum handed to the
    next chunk, which ramps in) is bitwise-identical to the single-pass
    accumulation.

They exercise the REAL make_window_plan / window_blend_weights and
mirror forward's is_first/is_last/carry protocol exactly
(models/diffueraser/model.py:561-666); the full pipeline versions of
these claims live in tests/test_chunking.py (slow).
"""
import numpy as np
import pytest

from videovanish_tpu.models.diffueraser.model import (
    make_window_plan, window_blend_weights,
)


def accumulate(T, clip_len, overlap, window_value, carry=None,
               withhold_tail=0):
    """Mirror forward's accumulation loop on synthetic per-window values.

    window_value(start, length) -> (length, ...) array for that window.
    carry: optional (acc_tail, wsum_tail) from a previous chunk.
    withhold_tail: frames at the end left un-final (next chunk's carry).
    Returns (acc, wsum) f32 arrays — division deferred like forward's
    decode step.
    """
    overlap = min(overlap, clip_len - 1) if clip_len > 1 else 0
    plan = make_window_plan(T, clip_len, overlap)
    D = np.asarray(window_value(*plan[0])).shape[-1]
    acc = np.zeros((T, D), np.float32)
    wsum = np.zeros((T, 1), np.float32)
    carry_n = 0
    if carry is not None:
        z_in, w_in = carry
        carry_n = z_in.shape[0]
        acc[:carry_n] = z_in
        wsum[:carry_n] = w_in
    for wi, (s, L) in enumerate(plan):
        bw = window_blend_weights(
            L, min(overlap, L - 1) if L > 1 else 0,
            is_first=(wi == 0 and carry_n == 0),
            is_last=(wi == len(plan) - 1 and withhold_tail == 0),
        ).astype(np.float32)[:, None]
        acc[s:s + L] += bw * window_value(s, L).astype(np.float32)
        wsum[s:s + L] += bw
    return acc, wsum


@pytest.mark.parametrize("T,clip,ov", [
    (8, 8, 2), (14, 8, 2), (22, 8, 4), (38, 22, 6), (9, 4, 1),
    (23, 7, 3), (50, 22, 6), (5, 8, 2),
])
def test_every_frame_covered_with_positive_weight(T, clip, ov):
    acc, wsum = accumulate(T, clip, ov, lambda s, L: np.ones((L, 1)))
    assert (wsum > 0).all(), "a frame got zero blend weight"
    # constant input -> exactly the constant back (convexity at work)
    np.testing.assert_array_equal(acc / wsum, np.ones((T, 1), np.float32))


@pytest.mark.parametrize("clip,ov", [(8, 2), (8, 4), (6, 2), (4, 1)])
def test_plan_perturbation_invariance_when_windows_agree(clip, ov):
    """If per-window outputs are a pure function of the global frame
    index (guaranteed by global-index noise + deterministic denoise),
    the blended video is the function itself for ANY plan — so changing
    clip_length or overlap cannot move non-seam pixels. An off-by-one
    window start breaks the agreement and fails the exactness."""
    T = 23
    f = np.linspace(-3.0, 7.0, T, dtype=np.float32)[:, None]
    acc, wsum = accumulate(T, clip, ov, lambda s, L: f[s:s + L])
    np.testing.assert_allclose(acc / wsum, f, rtol=0, atol=1e-6)


def test_overlap_ramp_orientation():
    """Window A outputs 0, window B outputs 1: across their shared
    frames the blend must increase strictly monotonically from A's side
    to B's side (earlier window fades OUT). A flipped ramp fails."""
    T, clip, ov = 20, 12, 4  # windows [0,12) and [8,20), 4 shared frames
    plan = make_window_plan(T, clip, ov)
    assert len(plan) == 2
    (s0, L0), (s1, L1) = plan
    lo, hi = s1, s0 + L0  # shared frames [lo, hi)
    assert hi - lo == ov

    acc, wsum = accumulate(
        T, clip, ov,
        lambda s, L: np.zeros((L, 1)) if s == s0 else np.ones((L, 1)))
    blend = (acc / wsum)[:, 0]
    np.testing.assert_array_equal(blend[:lo], 0.0)   # pure window A
    np.testing.assert_array_equal(blend[hi:], 1.0)   # pure window B
    seam = blend[lo:hi]
    assert (np.diff(seam) > 0).all(), f"seam not increasing: {seam}"
    assert seam[0] < 0.5 < seam[-1], f"seam not oriented A->B: {seam}"


@pytest.mark.parametrize("T,clip,ov,split", [
    (14, 8, 2, 6), (22, 8, 4, 8), (30, 8, 2, 12),
])
def test_two_chunk_carry_accumulation_bitwise(T, clip, ov, split):
    """Chunk 1 = frames [0, split+ov) withholding the ov-frame tail;
    chunk 2 = frames [split, T) starting from the carried (acc, wsum).
    Must equal the single-pass accumulators BITWISE (f32 adds in the
    same order — the north-star bitwise-stable seam claim at the
    accumulator level). Window values are a function of the global
    index, exactly like global-index noise makes them in forward()."""
    rng = np.random.default_rng(0)
    f = rng.standard_normal((T, 3)).astype(np.float32)

    def wv(offset):
        return lambda s, L: f[offset + s: offset + s + L]

    single_acc, single_w = accumulate(T, clip, ov, wv(0))

    c1 = split + ov  # chunk 1 covers [0, split+ov)
    acc1, w1 = accumulate(c1, clip, ov, wv(0), withhold_tail=ov)
    carry = (acc1[-ov:], w1[-ov:])
    acc2, w2 = accumulate(T - split, clip, ov, wv(split), carry=carry)

    chunked_acc = np.concatenate([acc1[:split], acc2])
    chunked_w = np.concatenate([w1[:split], w2])
    np.testing.assert_array_equal(chunked_acc, single_acc)
    np.testing.assert_array_equal(chunked_w, single_w)
