"""Process-level runtime knobs.

This image's sitecustomize registers the TPU PJRT plugin in every python
process and pins the platform before user code runs, so the standard
JAX_PLATFORMS env var is ineffective. VV_PLATFORM provides the escape
hatch (used by CPU-only CI/subprocess tests): set VV_PLATFORM=cpu and
call apply_env_platform() early in an entry point.
"""
from __future__ import annotations

import os


def apply_env_platform() -> None:
    plat = os.environ.get("VV_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            n = os.environ.get("VV_CPU_DEVICES")
            if n:
                jax.config.update("jax_num_cpu_devices", int(n))
    if os.environ.get("VV_DEBUG_NANS") == "1":
        # numerical-sanitizer mode (SURVEY.md §5 race/sanitizer row: jit
        # purity removes data races; this catches NaN/Inf at the op that
        # produced them, at a large slowdown)
        import jax
        jax.config.update("jax_debug_nans", True)


def apply_env_distributed() -> None:
    """Multi-host bring-up from env (VV_COORDINATOR / VV_NUM_PROCESSES /
    VV_PROCESS_ID): call after apply_env_platform in entry points; a
    no-op on single-process runs. See core/mesh.initialize_distributed."""
    from videovanish_tpu.core.mesh import initialize_distributed
    initialize_distributed()
