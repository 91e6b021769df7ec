"""Chunked long-video driver: plan coverage, end-to-end streaming run,
determinism, and failure-resume (SURVEY.md §5 failure-recovery row)."""
import json
import os

import numpy as np
import pytest

from videovanish_tpu.pipeline.chunking import _chunk_plan, _pair_overlaps


def _emit_ranges(plan):
    """Spec for the frames each chunk EMITS in vanish_video_chunked: the
    driver passes return_latent_tail=ov_next, so chunk i writes
    [s, e - ov_next) and the final chunk writes through its end —
    concatenated, every frame exactly once."""
    ovs = _pair_overlaps(plan)
    return [(s, e if i == len(plan) - 1 else e - ovs[i + 1])
            for i, (s, e) in enumerate(plan)]


class TestPlan:
    @pytest.mark.parametrize("total,chunk,ov", [(100, 48, 8), (48, 48, 8),
                                                (49, 48, 8), (10, 4, 1),
                                                (1000, 48, 8)])
    def test_every_frame_finalized_once(self, total, chunk, ov):
        ov = min(ov, chunk - 1)
        plan = _chunk_plan(total, chunk, ov)
        fin = _emit_ranges(plan)
        covered = np.zeros(total, int)
        for lo, hi in fin:
            covered[lo:hi] += 1
        assert (covered == 1).all(), covered

    def test_chunks_within_bounds_and_uniform(self):
        plan = _chunk_plan(100, 48, 8)
        for s, e in plan:
            assert 0 <= s < e <= 100
            # every chunk is exactly chunk_frames when total > chunk:
            # a shape-changing tail would recompile the whole model stack
            assert e - s == 48


@pytest.fixture(scope="module")
def tiny_cfg_module():
    from videovanish_tpu.pipeline import infill
    from videovanish_tpu.config import tiny_config
    infill.set_config(tiny_config())
    yield
    infill.set_config(None)


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    from videovanish_tpu.video import write_video_frames_to_path
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("vids")
    T, H, W = 20, 64, 64
    frames = [(rng.random((H, W, 3)) * 255).astype(np.uint8)
              for _ in range(T)]
    masks = []
    for _ in range(T):
        m = np.zeros((H, W, 3), np.uint8)
        m[20:40, 20:40] = 255
        masks.append(m)
    cp, mp = str(d / "c.mkv"), str(d / "m.mkv")
    write_video_frames_to_path(cp, frames, 24.0, H, W)
    write_video_frames_to_path(mp, masks, 24.0, H, W)
    return cp, mp, frames, masks


class TestChunkedDriver:
    def test_end_to_end_and_deterministic(self, tiny_cfg_module, videos,
                                          tmp_path):
        from videovanish_tpu.pipeline.chunking import vanish_video_chunked
        from videovanish_tpu.video import load_video_frames_from_path
        cp, mp, frames, _ = videos
        out1 = str(tmp_path / "o1.mkv")
        out2 = str(tmp_path / "o2.mkv")
        vanish_video_chunked(cp, mp, out1, chunk_frames=8, overlap_frames=2,
                             max_img_size=64)
        vanish_video_chunked(cp, mp, out2, chunk_frames=8, overlap_frames=2,
                             max_img_size=64)
        a, fps = load_video_frames_from_path(out1)
        b, _ = load_video_frames_from_path(out2)
        assert len(a) == 20 and fps == 24.0
        np.testing.assert_array_equal(np.stack(a), np.stack(b))
        # far corner is outside dilated+feathered mask: preserved exactly
        np.testing.assert_array_equal(a[0][:5, :5], frames[0][:5, :5])

    def test_resume_skips_completed_chunks(self, tiny_cfg_module, videos,
                                           tmp_path):
        from videovanish_tpu.pipeline import infill
        from videovanish_tpu.pipeline.chunking import vanish_video_chunked
        cp, mp, _, _ = videos
        out = str(tmp_path / "r.mkv")
        wd = str(tmp_path / "wd")

        calls = []
        orig = infill.run_infill_on_frames

        def counting(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        def bomb(*a, **kw):
            calls.append(1)
            if len(calls) == 3:
                raise RuntimeError("simulated crash")
            return orig(*a, **kw)

        # vanish_video_chunked resolves run_infill_on_frames from the
        # infill module at call time, so patch it there
        try:
            infill.run_infill_on_frames = bomb
            with pytest.raises(RuntimeError):
                vanish_video_chunked(cp, mp, out, chunk_frames=8,
                                     overlap_frames=2, max_img_size=64,
                                     work_dir=wd)
            # resume: only the remaining chunks run
            n_before = len(calls)
            infill.run_infill_on_frames = counting
            vanish_video_chunked(cp, mp, out, chunk_frames=8,
                                 overlap_frames=2, max_img_size=64,
                                 work_dir=wd)
            n_resumed = len(calls) - n_before
            plan = _chunk_plan(20, 8, 2)
            assert n_resumed == len(plan) - 2  # 2 chunks survived the crash
            assert os.path.exists(out)
        finally:
            infill.run_infill_on_frames = orig

    def test_cancel_between_chunks(self, tiny_cfg_module, videos, tmp_path):
        from videovanish_tpu.core.prog import CancelledError
        from videovanish_tpu.pipeline.chunking import vanish_video_chunked
        cp, mp, _, _ = videos
        with pytest.raises(CancelledError):
            vanish_video_chunked(cp, mp, str(tmp_path / "c.mkv"),
                                 chunk_frames=8, overlap_frames=2,
                                 max_img_size=64,
                                 is_canceled=lambda: True)


class TestLatentSeamBlending:
    """VERDICT r1 item 6 / BASELINE config 4: chunk seams blend in
    LATENT space with globally-shared noise."""

    def test_two_chunk_equals_single_pass_aligned(self, tiny_cfg_module,
                                                  rng):
        """When the chunk boundary aligns with a window boundary and the
        chunk overlap equals the window overlap, a 2-chunk carry run
        must match a single-pass windowed run (same windows, same
        global noise, same latent blend) up to decode rounding."""
        from videovanish_tpu.pipeline import infill
        T, H, W = 14, 64, 64
        # tiny config: clip_length=8, clip_overlap=2 -> single-pass
        # windows [0,8) and [6,14); split at s=6 with overlap 2
        frames = [(rng.random((H, W, 3)) * 255).astype(np.uint8)
                  for _ in range(T)]
        masks = []
        for _ in range(T):
            m = np.zeros((H, W, 3), np.uint8)
            m[20:40, 20:40] = 255
            masks.append(m)
        # fixed prior so the chunk-local ProPainter context can't differ
        prior = [f.copy() for f in frames]

        single = infill.run_infill_on_frames(
            frames, masks, propainer_frames=prior, max_img_size=64)

        out0, carry = infill.run_infill_on_frames(
            frames[:8], masks[:8], propainer_frames=prior[:8],
            max_img_size=64, frame_offset=0, return_latent_tail=2)
        out1 = infill.run_infill_on_frames(
            frames[6:], masks[6:], propainer_frames=prior[6:],
            max_img_size=64, frame_offset=6, latent_carry=carry)
        chunked = out0 + out1
        assert len(chunked) == len(single) == T
        for t in range(T):
            diff = np.abs(chunked[t].astype(np.int32)
                          - single[t].astype(np.int32))
            assert diff.max() <= 1, f"frame {t}: max diff {diff.max()}"

    def test_bitwise_reproducible_with_carry(self, tiny_cfg_module, rng):
        from videovanish_tpu.pipeline import infill
        T, H, W = 10, 64, 64
        frames = [(rng.random((H, W, 3)) * 255).astype(np.uint8)
                  for _ in range(T)]
        masks = [np.full((H, W, 3), 0, np.uint8) for _ in range(T)]
        for m in masks:
            m[10:30, 10:30] = 255
        prior = [f.copy() for f in frames]

        def run():
            o0, c = infill.run_infill_on_frames(
                frames[:8], masks[:8], propainer_frames=prior[:8],
                max_img_size=64, return_latent_tail=2)
            o1 = infill.run_infill_on_frames(
                frames[6:], masks[6:], propainer_frames=prior[6:],
                max_img_size=64, frame_offset=6, latent_carry=c)
            return o0 + o1

        a, b = run(), run()
        for t in range(T):
            np.testing.assert_array_equal(a[t], b[t])
