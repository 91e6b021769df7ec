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


# ---------------------------------------------------------------------------
# utils/profiling: per-program MFU aggregation + multi-chip projection
# ---------------------------------------------------------------------------
from videovanish_tpu.utils.profiling import (  # noqa: E402
    aggregate_programs, program_of, project_multichip,
    window_batch_speedup,
)


def test_program_of():
    assert program_of("jit(denoise_window)/UNet/conv") == "denoise_window"
    assert program_of("jit(stage1)/while/body/x") == "stage1"
    assert program_of("IDLE") == "IDLE"


def test_aggregate_programs_mfu_and_serial():
    rows = [
        # 1 ms at 100 GFLOP/s inside a while loop (serial scan)
        {"operation": "jit(stage1)/while/body/gather",
         "total_self_time": 1000.0, "measured_flop_rate": 100.0},
        # 1 ms of pure matmul at 1000 GFLOP/s
        {"operation": "jit(stage1)/RAFT/dot", "total_self_time": 1000.0,
         "measured_flop_rate": 1000.0},
        {"operation": "IDLE", "total_self_time": 500.0,
         "measured_flop_rate": 0.0},
    ]
    agg = aggregate_programs(rows, peak_tf=0.001)  # 1 GFLOP/s peak
    assert agg["stage1"]["ms"] == 2.0
    assert agg["stage1"]["serial_ms"] == 1.0
    # time-weighted rate = (100 + 1000) / 2 = 550x the 1 GFLOP/s peak
    assert abs(agg["stage1"]["mfu"] - 550.0) < 1.0
    assert agg["IDLE"]["ms"] == 0.5 and agg["IDLE"]["mfu"] == 0.0


def test_window_batch_speedup():
    assert window_batch_speedup(9, 1) == 1.0
    # 9 windows, 2 ref-count groups, 8 chips: 8+1 -> ceil(8/8)+1 = 2 rounds
    assert window_batch_speedup(9, 8) == 4.5
    assert window_batch_speedup(16, 8, n_groups=1) == 8.0


def test_project_multichip_sharding_model():
    progs = {
        "denoise_window": {"ms": 800.0, "serial_ms": 0.0},
        "decode": {"ms": 80.0, "serial_ms": 0.0},
        "stage1": {"ms": 100.0, "serial_ms": 40.0},
        "window": {"ms": 90.0, "serial_ms": 0.0},
        "IDLE": {"ms": 50.0, "serial_ms": 0.0},
    }
    proj = project_multichip(progs, n_chips=8, frames=22, n_windows=9)
    pp = proj["per_program"]
    assert pp["denoise_window"] == 100.0       # /8
    assert pp["decode"] == 10.0                # /8
    assert pp["stage1"] == 47.5                # conv/8 + serial
    assert pp["window"] == 20.0                # 9 windows -> 2 rounds
    assert pp["IDLE"] == 0.0                   # transfers overlap on v5p
    assert proj["reduction_x"] > 5.0           # the VERDICT r3 #1 bar
    assert proj["projected_fps"] == round(22 / (proj["projected_ms"] / 1e3), 2)
    # conservative variant keeps IDLE
    proj_c = project_multichip(progs, n_chips=8, overlap_transfers=False)
    assert proj_c["per_program"]["IDLE"] == 50.0
