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
    """The conversion helpers mirror reference :57-61; import them only
    when PySide6 exists, else verify the math inline."""
    if HAS_PYSIDE:
        from videovanish_tpu.gui.player import frame_to_ms, ms_to_frame
    else:
        def ms_to_frame(ms, fps):
            return int(round(ms * fps / 1000.0))

        def frame_to_ms(fr, fps):
            return int(round(fr * 1000.0 / fps))
    fps = 29.97
    for f in [0, 1, 2, 100, 1234]:
        assert ms_to_frame(frame_to_ms(f, fps), fps) == f


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
