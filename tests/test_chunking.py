"""Chunked long-video driver: plan coverage, end-to-end streaming run,
determinism, and failure-resume (SURVEY.md §5 failure-recovery row)."""
import json
import os

import numpy as np
import pytest

from videovanish_tpu.pipeline.chunking import _blend_ranges, _chunk_plan


class TestPlan:
    @pytest.mark.parametrize("total,chunk,ov", [(100, 48, 8), (48, 48, 8),
                                                (49, 48, 8), (10, 4, 1),
                                                (1000, 48, 8)])
    def test_every_frame_finalized_once(self, total, chunk, ov):
        ov = min(ov, chunk - 1)
        plan = _chunk_plan(total, chunk, ov)
        fin = _blend_ranges(plan)
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
