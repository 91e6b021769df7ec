#!/usr/bin/env python3
"""Freeze the single-device golden for the dryrun's judged-surface leg.

__graft_entry__.dryrun_multichip used to run the single-device reference
in-process, which doubled a multi-minute CPU workload and timed out the
driver (VERDICT r4 item 1). Instead the SPMD dryrun now compares against
this frozen golden; tests/test_dryrun_golden.py keeps it honest (fails
when code/config drift makes the committed file stale).

Run on CPU (single device):
    python scripts/make_dryrun_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as ge  # noqa: E402


def main():
    out, mesh, fp = ge._dryrun_pipeline_run(8, mesh_mode="0")
    assert mesh is None
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden",
        "dryrun_pipeline.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, frames=out, fingerprint=fp)
    print(f"wrote {path} frames={out.shape} fingerprint={fp}")


if __name__ == "__main__":
    main()
