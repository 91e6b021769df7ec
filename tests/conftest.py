"""Test harness: force CPU backend with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4). Must run before jax imports."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize pre-imports jax and registers the TPU (axon)
# plugin before conftest runs, so env vars alone are too late; backend
# selection is lazy, so the config update below still wins.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent jit cache: no-op on the CPU backend (reloading XLA:CPU AOT
# blobs trips a machine-feature mismatch on this host — see
# core/runtime.apply_compilation_cache); set VV_JIT_CACHE=<dir> to force
from videovanish_tpu.core.runtime import apply_compilation_cache

apply_compilation_cache()

import numpy as np
import pytest

# Tests measured >~30s on this 1-core host (full-suite --durations, round 3:
# 73 min total). Marked centrally so the core gate stays one flag:
#   python -m pytest tests/ -x -q -m "not slow"   # ~10 min
# Full suite (default, no -m) remains the merge gate.
SLOW_TESTS = {
    "test_infill_spmd.py::TestInfillSPMD::test_auto_mesh_matches_single_device",        # 549s
    "test_pipeline.py::TestDiffuEraseCLI::test_cli_end_to_end",                         # 384s
    "test_chunking.py::TestChunkedDriver::test_end_to_end_and_deterministic",           # 379s
    "test_train.py::TestTrainStep::test_loss_decreases",                                # 377s
    "test_train.py::test_remat_matches_non_remat",                                      # 360s
    "test_train.py::TestTrainStep::test_checkpoint_roundtrip",                          # 357s
    "test_pipeline.py::TestInfillPipeline::test_end_to_end_composite_semantics",        # 201s
    "test_parallel.py::TestDryrunMultichip::test_graft_dryrun",                         # 189s
    "test_diffueraser.py::TestClassifierFreeGuidance::test_guidance_zero_matches_default_and_nonzero_differs",  # 143s
    "test_pipeline.py::TestInfillPipeline::test_progress_callback_contract",            # 115s
    "test_parallel.py::TestMeshInference::test_diffueraser_spmd_matches_single_device", # 115s
    "test_propainter.py::TestPropainterTiny::test_forward_end_to_end",                  # 99s
    "test_pipeline.py::TestInfillPipeline::test_roi_fetch_exact_vs_full",               # 83s
    "test_chunking.py::TestLatentSeamBlending::test_bitwise_reproducible_with_carry",   # 69s
    "test_diffueraser.py::TestDiffuEraserTiny::test_forward_shapes_and_determinism",    # 60s
    "test_parallel.py::TestRingAttentionInUNet::test_unet_ring_matches_dense",          # 55s
    "test_diffueraser.py::TestDevicePriorHandoff::test_device_prior_matches_host_prior",# 54s
    "test_diffueraser.py::TestDiffuEraserTiny::test_forward_with_prior_and_rgb_mask",   # 53s
    "test_propainter.py::TestFlowCompletionDriver::test_passthrough_outside_mask",      # 47s
    "test_parity.py::TestSam2HieraParityHF::test_backbone_matches_hf",                  # 40s
    "test_propainter_oracle.py::TestInpaintGenerator::test_full_generator_parity",      # 33s
    "test_propainter.py::TestPropainterTiny::test_single_frame_with_internal_resize",   # 32s
    "test_infill_spmd.py::TestInfillSPMD::test_mesh_disabled_by_env",                   # 31s
    "test_infill_spmd.py::TestInfillSPMD::test_clip_length_rounds_up_to_data_axis",     # 28s
    "test_dryrun_golden.py::test_golden_matches_fresh_single_device_run",               # ~260s
    "test_e2e_quality.py::TestEndToEndQuality::test_prior_sweep_properties",            # ~150s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.rsplit("/", 1)[-1].split("[")[0]
        if key in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
