"""Stage-timer plumbing (utils/observability.py)."""
import numpy as np

from videovanish_tpu.utils.observability import (
    _STAGE_COLLECTORS, collect_stages, record_stage, stage_timer,
)


def test_stage_timer_records_into_collector():
    got = []
    with collect_stages(got):
        with stage_timer("mystage", frames=4):
            pass
    assert len(got) == 1
    name, secs, fields = got[0]
    assert name == "mystage" and secs >= 0.0 and fields == {"frames": 4}
    assert not _STAGE_COLLECTORS


def test_record_stage_fans_out_like_stage_timer():
    got = []
    with collect_stages(got):
        record_stage("sub", 0.25, windows=3)
    assert got == [("sub", 0.25, {"windows": 3})]


def test_nested_equal_collectors_unregister_by_identity():
    # Regression: nested sinks receive identical appends, so they compare
    # equal; list.remove() would pop the OUTER list on inner exit and
    # leave the inner one registered after the outer exits.
    outer, inner = [], []
    with collect_stages(outer):
        with collect_stages(inner):
            record_stage("s", 1.0)
        assert outer == inner  # equal by value, distinct objects
        assert any(c is outer for c in _STAGE_COLLECTORS)
        assert not any(c is inner for c in _STAGE_COLLECTORS)
        record_stage("t", 2.0)
    assert not _STAGE_COLLECTORS
    assert [n for n, _, _ in outer] == ["s", "t"]
    assert [n for n, _, _ in inner] == ["s"]
