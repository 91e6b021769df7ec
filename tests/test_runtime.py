"""core/runtime process-level knobs.

The critical invariant: apply_env_platform (used by every CLI) must be
able to force the CPU backend even though this image's sitecustomize
pins the TPU plugin — which means nothing in its path may initialize a
jax backend before the platform decision. A regression here silently
attaches CPU-only subprocesses (tests, verify drives, the driver's
multichip dryrun) to the serial TPU tunnel, where a second concurrent
process wedges both.
"""
import os
import subprocess
import sys

import pytest


def _run(code: str, **env):
    full_env = {**os.environ, **{k: str(v) for k, v in env.items()}}
    return subprocess.run([sys.executable, "-c", code], env=full_env,
                          capture_output=True, text=True, timeout=300)


CHECK = """
from videovanish_tpu.core.runtime import apply_env_platform
apply_env_platform()
import jax
print("backend=" + jax.default_backend())
print("cachedir=" + repr(jax.config.jax_compilation_cache_dir))
"""


def test_apply_env_platform_cpu_does_not_touch_tpu():
    """VV_PLATFORM=cpu must yield the CPU backend (the compilation-cache
    probe must not initialize the default backend first)."""
    r = _run(CHECK, VV_PLATFORM="cpu")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "backend=cpu" in r.stdout, r.stdout
    # CPU backend: persistent cache stays off (XLA:CPU AOT reloads trip
    # a machine-feature mismatch on this host)
    assert "cachedir=None" in r.stdout, r.stdout


def test_jit_cache_opt_out_and_forced_dir(tmp_path):
    r = _run(CHECK, VV_PLATFORM="cpu", VV_JIT_CACHE="0")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cachedir=None" in r.stdout, r.stdout

    d = tmp_path / "jitcache"
    r = _run(CHECK, VV_PLATFORM="cpu", VV_JIT_CACHE=str(d))
    assert r.returncode == 0, r.stderr[-2000:]
    # explicit dir forces the cache on, even on CPU
    assert f"cachedir={str(d)!r}" in r.stdout, r.stdout
    assert d.is_dir()


def test_jit_cache_enabled_for_tpu_primary_platform():
    """This image's sitecustomize sets jax_platforms to "axon,cpu" (cpu
    as FALLBACK only). The cache decision must key on the PRIMARY
    platform — a substring test disabled the cache for every TPU
    process, so the driver's bench recompiled SD-sized programs
    (~minutes each) every round (round-5 find). The probe must also not
    initialize any backend (no TPU attach from a config check)."""
    code = """
import jax
# simulate the sitecustomize platform pin without touching a backend
jax.config.update("jax_platforms", "axon,cpu")
from videovanish_tpu.core.runtime import apply_compilation_cache
apply_compilation_cache()
import jax._src.xla_bridge as xb
print("initialized=" + str(xb.backends_are_initialized()))
print("cachedir=" + repr(jax.config.jax_compilation_cache_dir))
"""
    r = _run(code)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "initialized=False" in r.stdout, r.stdout
    assert "cachedir=None" not in r.stdout, r.stdout
    assert "videovanish_tpu" in r.stdout, r.stdout


def test_debug_nans_flag():
    code = """
from videovanish_tpu.core.runtime import apply_env_platform
apply_env_platform()
import jax
print("nans=" + str(jax.config.jax_debug_nans))
"""
    r = _run(code, VV_PLATFORM="cpu", VV_DEBUG_NANS="1")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "nans=True" in r.stdout, r.stdout
