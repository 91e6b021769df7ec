"""GUI layer: pure-python annotation model (JSON schema parity,
reference videovanish.py:1091-1147), ms<->frame conversion, and clean
import gating when PySide6 is absent."""
import importlib.util
import json
import subprocess
import sys

import pytest

from videovanish_tpu.gui.annotations import AnnotationStore, Keyframe

HAS_PYSIDE = importlib.util.find_spec("PySide6") is not None


class TestAnnotationStore:
    def test_json_roundtrip_schema(self):
        s = AnnotationStore()
        kf = s.get_or_create(5)
        kf.pos_clicks.append((0.1, 0.2, 1))
        kf.neg_clicks.append((0.3, 0.4, 2))
        kf.rects.append((0.1, 0.1, 0.2, 0.3, 1))
        obj = s.to_json_obj(video="v.mkv", fps=24.0)
        # exact schema keys (reference :1097-1109)
        assert set(obj) == {"video", "fps", "keyframes"}
        k = obj["keyframes"][0]
        assert set(k) == {"frame_idx", "pos_clicks", "neg_clicks", "rects"}
        assert k["pos_clicks"][0] == {"x": 0.1, "y": 0.2, "obj": 1}
        assert k["rects"][0] == {"x": 0.1, "y": 0.1, "w": 0.2, "h": 0.3,
                                 "obj": 1}
        s2 = AnnotationStore()
        s2.load_from_json_obj(json.loads(json.dumps(obj)))
        assert s2.to_json_obj("v.mkv", 24.0) == obj

    def test_prune_empty(self):
        s = AnnotationStore()
        s.get_or_create(3)
        assert s.prune_if_empty(3)
        assert 3 not in s.keyframes

    def test_preview_remap_to_zero(self):
        s = AnnotationStore()
        s.get_or_create(7).pos_clicks.append((0.5, 0.5, 1))
        s.get_or_create(2).pos_clicks.append((0.4, 0.4, 1))
        d = s.annotations_dict(only_frame=7, remap_to_zero=True)
        assert len(d["keyframes"]) == 1
        assert d["keyframes"][0]["frame_idx"] == 0

    def test_max_obj_id(self):
        s = AnnotationStore()
        s.get_or_create(0).rects.append((0, 0, 1, 1, 4))
        assert s.max_obj_id() == 4


def test_ms_frame_conversion_without_qt():
    """The conversion helpers mirror reference :57-61; gui/sync_logic.py
    is PySide6-free by design."""
    from videovanish_tpu.gui.sync_logic import frame_to_ms, ms_to_frame
    fps = 29.97
    for f in [0, 1, 2, 100, 1234]:
        assert ms_to_frame(frame_to_ms(f, fps), fps) == f


class TestSyncLogic:
    """The 3-player sync policy (reference videovanish.py:493-980),
    testable headlessly via gui/sync_logic.py — gui/player.py's Qt
    methods delegate to these functions."""

    def test_resync_only_over_drift_threshold(self):
        from videovanish_tpu.gui.sync_logic import followers_to_resync
        # drift of exactly 35 ms does NOT resync (strictly greater,
        # reference :872-884); 36 ms does
        assert followers_to_resync(1000, [1035, 965], [True, True]) == []
        assert followers_to_resync(1000, [1036, 963], [True, True]) == [0, 1]
        assert followers_to_resync(1000, [1100, 1000], [True, True]) == [0]

    def test_resync_skips_unloaded_followers(self):
        from videovanish_tpu.gui.sync_logic import followers_to_resync
        # a follower with no source never snaps, however far off
        assert followers_to_resync(1000, [0, 2000], [False, True]) == [1]
        assert followers_to_resync(1000, [0, 2000], [False, False]) == []

    def test_master_time_prefers_frame_timestamp(self):
        from videovanish_tpu.gui.sync_logic import master_frame_ms
        # valid sink timestamp (us) wins over the player clock (ms)
        assert master_frame_ms(500_000, 123.0) == 500.0
        # invalid (-1/0/None) timestamps fall back to the clock
        assert master_frame_ms(-1, 123.0) == 123.0
        assert master_frame_ms(0, 123.0) == 123.0
        assert master_frame_ms(None, 123.0) == 123.0

    def test_frame_count_from_duration(self):
        from videovanish_tpu.gui.sync_logic import frame_count
        assert frame_count(1000.0, 24.0) == 24
        assert frame_count(0.0, 24.0) == 0

    def test_preview_frame_index_window(self):
        from videovanish_tpu.gui.sync_logic import preview_frame_index
        # 22-frame preview starting at frame 10 (reference N=22, :1572)
        assert preview_frame_index(10, 22, 9) is None
        assert preview_frame_index(10, 22, 10) == 0
        assert preview_frame_index(10, 22, 31) == 21
        assert preview_frame_index(10, 22, 32) is None

    def test_chip_bar_sorted_insert(self):
        from videovanish_tpu.gui.sync_logic import chip_insert_pos
        order = []
        for f in [30, 10, 20, 5, 40]:
            order.insert(chip_insert_pos(order, f), f)
        assert order == [5, 10, 20, 30, 40]

    def test_toolbar_volume_mapping(self):
        """Toolbar slider -> QAudioOutput volume, reference
        videovanish.py:850 (linear /100, clipped) with the :1622
        default of 90."""
        from videovanish_tpu.gui.sync_logic import (
            VOLUME_SLIDER_DEFAULT, volume_from_slider,
        )
        assert VOLUME_SLIDER_DEFAULT == 90
        assert volume_from_slider(0) == 0.0
        assert volume_from_slider(50) == 0.5
        assert volume_from_slider(100) == 1.0
        assert volume_from_slider(-5) == 0.0    # clipped like the reference
        assert volume_from_slider(150) == 1.0
        assert volume_from_slider(VOLUME_SLIDER_DEFAULT) == 0.9


def test_videovanish_cli_degrades_without_pyside(tmp_path):
    if HAS_PYSIDE:
        pytest.skip("PySide6 present; degradation path not applicable")
    r = subprocess.run(
        [sys.executable, "videovanish.py"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert r.returncode == 2
    assert "GUI unavailable" in r.stderr
    assert "diffuerase.py" in r.stderr


@pytest.mark.skipif(not HAS_PYSIDE, reason="PySide6 not installed")
def test_gui_modules_import():
    import videovanish_tpu.gui.app  # noqa: F401
    import videovanish_tpu.gui.main_window  # noqa: F401
