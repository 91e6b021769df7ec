"""Keeper tests for the dryrun's judged-surface golden.

__graft_entry__.dryrun_multichip compares its SPMD pipeline output to a
frozen single-device golden instead of re-running the single-device
reference in-process (which doubled a multi-minute CPU workload and
timed out the round-4 driver, VERDICT r4 item 1). These tests keep the
committed golden honest:

  - fast: the golden file exists and its config fingerprint matches the
    live dryrun_config (catches config/model drift inside the core gate
    without a model run);
  - slow: a fresh single-device run at dryrun_config still equals the
    committed frames bitwise (catches numerical drift).

Regenerate after intentional changes: python scripts/make_dryrun_golden.py
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "dryrun_pipeline.npz")
REGEN = "regenerate with: python scripts/make_dryrun_golden.py"


def test_golden_fingerprint_current():
    import __graft_entry__ as ge
    from videovanish_tpu.config import dryrun_config

    assert os.path.exists(GOLDEN), f"missing {GOLDEN}; {REGEN}"
    g = np.load(GOLDEN)
    fp = ge._dryrun_fingerprint(dryrun_config())
    assert str(g["fingerprint"]) == fp, (
        f"dryrun_config changed since the golden was frozen; {REGEN}")
    assert g["frames"].shape == (8, 64, 64, 3)
    assert g["frames"].dtype == np.uint8


def test_golden_matches_fresh_single_device_run(monkeypatch):
    """SLOW (~4-5 min): full single-device pipeline at dryrun shapes."""
    import __graft_entry__ as ge
    from videovanish_tpu.pipeline import infill

    monkeypatch.setenv("VV_MESH", "0")
    try:
        out, mesh, fp = ge._dryrun_pipeline_run(8, mesh_mode="0")
    finally:
        # _dryrun_pipeline_run installs dryrun_config into the module
        # singletons; reset so later tests re-resolve their own config
        infill.set_config(None)
    assert mesh is None
    g = np.load(GOLDEN)
    if str(g["fingerprint"]) != fp:
        pytest.fail(f"golden fingerprint stale; {REGEN}")
    assert np.array_equal(out, g["frames"]), (
        "single-device dryrun output drifted from the committed golden; "
        f"if the change is intentional, {REGEN}")
