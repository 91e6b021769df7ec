"""Tracing, profiling and structured logging.

The reference has no observability at all (SURVEY.md §5: unused
`import time`, bare prints at videovanish.py:927, tools.py:45). Here:
  - structured per-stage timers (JSON lines on VV_LOG=json, human
    otherwise; silent unless VV_LOG is set),
  - jax.profiler integration: VV_PROFILE_DIR=<dir> captures a TPU trace
    (xprof/Perfetto-compatible) around profiled regions,
  - TraceAnnotation wrappers so pipeline stages show up named in traces.
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time

_LOGGER = None


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        lg = logging.getLogger("videovanish_tpu")
        mode = os.environ.get("VV_LOG", "")
        if mode and not lg.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(
                "%(message)s" if mode == "json"
                else "[vv %(asctime)s] %(message)s"))
            lg.addHandler(h)
            lg.setLevel(logging.INFO)
        _LOGGER = lg
    return _LOGGER


def _emit(event: str, **fields):
    lg = get_logger()
    if not lg.handlers:
        return
    if os.environ.get("VV_LOG") == "json":
        lg.info(json.dumps({"event": event, **fields}))
    else:
        kv = " ".join(f"{k}={v}" for k, v in fields.items())
        lg.info(f"{event} {kv}")


_STAGE_COLLECTORS: list[list] = []


@contextlib.contextmanager
def collect_stages(into: list):
    """Capture stage_timer records in-process: appends
    (stage, seconds, fields) tuples to `into` for the duration.
    Used by bench.py to split end-to-end wall clock into stages."""
    _STAGE_COLLECTORS.append(into)
    try:
        yield into
    finally:
        # identity-based removal: nested collectors receive identical
        # appends, so equal-by-value lists must not unregister each other
        for i in range(len(_STAGE_COLLECTORS) - 1, -1, -1):
            if _STAGE_COLLECTORS[i] is into:
                del _STAGE_COLLECTORS[i]
                break


def record_stage(stage: str, seconds: float, **fields) -> None:
    """Report a stage duration measured externally (e.g. sub-stage
    splits inside model code): fans out to active collect_stages sinks
    and the structured log, exactly like stage_timer's exit path."""
    for sink in _STAGE_COLLECTORS:
        sink.append((stage, seconds, fields))
    _emit("stage", name=stage, seconds=round(seconds, 4), **fields)


_SHARDING_TRACE: list | None = None


def trace_shardings(into: list | None) -> None:
    """Install (or clear, with None) a sink recording the ACTUAL input
    shardings each device program receives at dispatch time. The SPMD
    tests use this as ground truth that a mesh run really shards every
    program's operands (jit specializes on input shardings, so the
    recorded spec IS what the compiled HLO was partitioned for)."""
    global _SHARDING_TRACE
    _SHARDING_TRACE = into


def record_sharding(program: str, **arrays) -> None:
    """Record {name: partition-spec} of jax arrays entering `program`.
    No-op (zero cost beyond a None check) unless trace_shardings is on."""
    if _SHARDING_TRACE is None:
        return
    specs = {}
    for name, a in arrays.items():
        try:
            specs[name] = tuple(a.sharding.spec)
        except Exception:
            specs[name] = None
    _SHARDING_TRACE.append((program, specs))


@contextlib.contextmanager
def stage_timer(stage: str, **fields):
    """Time a pipeline stage; emits a structured record and annotates the
    device trace so the stage is visible in xprof."""
    t0 = time.perf_counter()
    with trace_annotation(stage):
        yield
    record_stage(stage, time.perf_counter() - t0, **fields)


@contextlib.contextmanager
def trace_annotation(name: str):
    try:
        import jax
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


_PROFILING = False


def start_profile(log_dir: str | None = None) -> bool:
    """Start a jax profiler trace (TPU timeline). Returns True if started."""
    global _PROFILING
    log_dir = log_dir or os.environ.get("VV_PROFILE_DIR")
    if not log_dir or _PROFILING:
        return False
    import jax
    jax.profiler.start_trace(log_dir)
    _PROFILING = True
    _emit("profile_start", dir=log_dir)
    return True


def stop_profile() -> None:
    global _PROFILING
    if _PROFILING:
        import jax
        jax.profiler.stop_trace()
        _PROFILING = False
        _emit("profile_stop")


@contextlib.contextmanager
def maybe_profile(log_dir: str | None = None):
    started = start_profile(log_dir)
    try:
        yield
    finally:
        if started:
            stop_profile()
