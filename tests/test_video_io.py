"""Video I/O edge (reference tools.py semantics) + observability knobs."""
import json
import logging
import os

import numpy as np
import pytest

from videovanish_tpu.video.io import (
    VideoFrameReader, load_video_frames_from_path, probe_video,
    write_video_frames_to_path,
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("io")
    T, H, W = 15, 32, 48
    frames = [np.full((H, W, 3), (i * 13) % 256, np.uint8) for i in range(T)]
    p = str(d / "v.mkv")
    write_video_frames_to_path(p, frames, 25.0, H, W)
    return p, frames


class TestIO:
    def test_ffv1_lossless_roundtrip(self, video):
        p, frames = video
        back, fps = load_video_frames_from_path(p)
        assert fps == 25.0 and len(back) == len(frames)
        for a, b in zip(back, frames):
            np.testing.assert_array_equal(a, b)

    def test_windowing(self, video):
        p, frames = video
        got, _ = load_video_frames_from_path(p, start_frame=5, max_frames=4)
        assert len(got) == 4
        np.testing.assert_array_equal(got[0], frames[5])
        np.testing.assert_array_equal(got[3], frames[8])

    def test_probe(self, video):
        p, frames = video
        n, fps, h, w = probe_video(p)
        assert (n, fps, h, w) == (15, 25.0, 32, 48)

    def test_writer_resizes_mismatched_frames(self, tmp_path, video):
        _, frames = video
        out = str(tmp_path / "o.mkv")
        # frames are 32x48 but we declare 16x24: writer nearest-resizes
        write_video_frames_to_path(out, frames[:3], 25.0, 16, 24)
        back, _ = load_video_frames_from_path(out)
        assert back[0].shape == (16, 24, 3)

    def test_streaming_reader_chunks(self, video):
        p, frames = video
        with VideoFrameReader(p, start_frame=2, max_frames=10) as rd:
            a = rd.read_chunk(4)
            b = rd.read_chunk(4)
            c = rd.read_chunk(4)  # only 2 left within the window
            d = rd.read_chunk(4)
        assert [len(a), len(b), len(c), len(d)] == [4, 4, 2, 0]
        np.testing.assert_array_equal(a[0], frames[2])
        np.testing.assert_array_equal(c[-1], frames[11])


class TestObservability:
    def test_stage_timer_json(self, monkeypatch, capsys):
        import importlib
        monkeypatch.setenv("VV_LOG", "json")
        import videovanish_tpu.utils.observability as obs
        importlib.reload(obs)
        records = []
        handler = logging.Handler()
        handler.emit = lambda r: records.append(r.getMessage())
        lg = obs.get_logger()
        lg.addHandler(handler)
        try:
            with obs.stage_timer("unit_stage", frames=3):
                pass
        finally:
            lg.removeHandler(handler)
            obs._LOGGER = None
        payload = json.loads(records[-1])
        assert payload["event"] == "stage"
        assert payload["name"] == "unit_stage" and payload["frames"] == 3
        assert payload["seconds"] >= 0

    def test_silent_without_env(self, monkeypatch):
        import importlib
        monkeypatch.delenv("VV_LOG", raising=False)
        import videovanish_tpu.utils.observability as obs
        importlib.reload(obs)
        obs._LOGGER = None
        with obs.stage_timer("quiet"):
            pass  # must not raise nor print
        obs._LOGGER = None


class TestRuntimeKnobs:
    def test_vv_platform_applies(self, monkeypatch):
        import jax
        from videovanish_tpu.core.runtime import apply_env_platform
        monkeypatch.setenv("VV_PLATFORM", "cpu")
        apply_env_platform()
        assert jax.default_backend() == "cpu"
