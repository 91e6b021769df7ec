"""Process-level runtime knobs.

This image's sitecustomize registers the TPU PJRT plugin in every python
process and pins the platform before user code runs, so the standard
JAX_PLATFORMS env var is ineffective. VV_PLATFORM provides the escape
hatch (used by CPU-only CI/subprocess tests): set VV_PLATFORM=cpu and
call apply_env_platform() early in an entry point.
"""
from __future__ import annotations

import os


def apply_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (VV_JIT_CACHE=0 opts
    out; VV_JIT_CACHE=<dir> overrides the location AND forces it on for
    any backend). SD-sized programs take minutes through this host's
    remote compiler — caching them makes every process after the first
    start in seconds. TPU-backend only by default: reloading XLA:CPU AOT
    blobs across processes trips a machine-feature mismatch ("could lead
    to execution errors such as SIGILL") on this host, and CPU compiles
    are cheap anyway."""
    val = os.environ.get("VV_JIT_CACHE", "")
    if val == "0":
        return
    cache_dir = val or os.path.join(
        os.path.expanduser("~"), ".cache", "videovanish_tpu", "jit")
    try:
        import jax
        if not val:
            # Decide the backend WITHOUT initializing it: calling
            # jax.default_backend() here would pin the sitecustomize
            # TPU plugin before apply_env_platform/conftest can force
            # CPU (and attach an unwanted extra process to the TPU).
            import jax._src.xla_bridge as xb
            if xb.backends_are_initialized():
                if jax.default_backend() != "tpu":
                    return
            else:
                plats = jax.config.jax_platforms \
                    or os.environ.get("VV_PLATFORM", "")
                # the PRIMARY platform decides the backend; this host's
                # sitecustomize sets "axon,cpu" (cpu as fallback only),
                # and a substring test wrongly disabled the cache for
                # every TPU process — the driver's bench then recompiled
                # SD-sized programs (~minutes each) every round
                primary = str(plats).split(",")[0].strip()
                if primary == "cpu":
                    return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min_compile_time (1s) skips trivial programs; cache
        # errors are non-fatal by default (raise_persistent_cache_errors
        # is False), so a wedged filesystem can't break inference
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def apply_env_platform() -> None:
    plat = os.environ.get("VV_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            n = os.environ.get("VV_CPU_DEVICES")
            if n:
                jax.config.update("jax_num_cpu_devices", int(n))
    # after the platform decision: the cache keys off the chosen backend
    apply_compilation_cache()
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
