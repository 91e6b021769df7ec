#!/usr/bin/env python3
"""Benchmark: end-to-end object-removal throughput on one chip.

Prints JSON lines; the FIRST is the primary metric:

  {"metric": "vanish_frames_per_sec_720p_1chip", ...}   end-to-end
      run_infill_on_frames: dilate -> ProPainter prior -> DiffuEraser
      windowed PCM denoise -> feathered composite. Codec I/O excluded
      (BASELINE.md's metric is object removal, not FFV1 encode).
  {"metric": "model_frames_per_sec_720p_1chip", ...}    DiffuEraser
      model.forward alone, derived from the same runs' stage timers.
  {"metric": "sam2_mask_frames_per_sec_480p_1chip", ...} SAM2 prompted
      mask generation + propagation (BASELINE.md metric list).
  {"metric": "host_link_MBps", ...}                     up/down probe of
      the axon tunnel — its throughput swings ~2x minute-to-minute and
      transfers serialize with compute, so this contextualizes variance.

vs_baseline is value / 10.0 for throughput lines — the north-star
"≥10 frames/sec end-to-end 720p object removal" on v5p-8 (BASELINE.md;
the reference publishes no numbers; this host is a single v5e).
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

REPEATS = 2  # best-of: the host link swings ~2x minute to minute

# The axon tunnel has two failure modes: jax errors (UNAVAILABLE — handled
# by _tpu_recovered retries) and silent HANGS where device queries block
# forever. A hung jax call can't be interrupted in-thread, so a watchdog
# thread guarantees the driver always gets a JSON line AND that we exit 0
# before the driver's own kill lands (round 4 was rc=124 with half the
# legs lost, VERDICT r4 item 2): if the primary metric hasn't been
# emitted after PRIMARY_BUDGET_S (first 720p compile takes ~5-10 min
# through the remote-compile path; warm cache makes it seconds), print an
# error metric and hard-exit; after that, self-exit 0 at the TOTAL
# deadline no matter which secondary leg is in flight. Secondary legs are
# ordered cheapest-first and the expensive MFU leg checks the remaining
# budget before starting.
PRIMARY_BUDGET_S = int(os.environ.get("VV_BENCH_PRIMARY_BUDGET_S",
                                      35 * 60))
TOTAL_BUDGET_S = int(os.environ.get("VV_BENCH_TOTAL_BUDGET_S", 50 * 60))
_t0 = time.monotonic()
_primary_emitted = threading.Event()


def _elapsed() -> float:
    return time.monotonic() - _t0


def _watchdog():
    if not _primary_emitted.wait(PRIMARY_BUDGET_S):
        emit("vanish_frames_per_sec_720p_1chip", 0.0, vs=0.0,
             error=f"watchdog: no primary metric after "
                   f"{PRIMARY_BUDGET_S}s (TPU tunnel hung)")
        os._exit(1)
    time.sleep(max(TOTAL_BUDGET_S - _elapsed(), 1.0))
    print(f"[bench] total deadline {TOTAL_BUDGET_S}s reached; exiting 0 "
          "with the legs emitted so far", file=sys.stderr)
    os._exit(0)  # primary metric is recorded; don't hang on secondaries


def probe_link(mb: int = 8):
    """Round-trip MB/s through the host<->device link, up and down."""
    import jax
    import jax.numpy as jnp

    buf = np.zeros((mb << 20,), np.uint8)
    sync = jax.jit(lambda a: jnp.sum(a[:: 1 << 20].astype(jnp.int32)))
    # warm the connection AND compile the sync program outside the timed
    # region (a remote compile takes seconds and would understate "up")
    float(sync(jax.device_put(buf)))
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    float(sync(d))  # force completion
    up = mb / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(d)
    down = mb / (time.perf_counter() - t0)
    return round(up, 1), round(down, 1)


def synth_clip(height, width, frames, seed=0):
    rng = np.random.default_rng(seed)
    video = (rng.random((frames, height, width, 3)) * 255).astype(np.uint8)
    masks = np.zeros((frames, height, width, 3), np.uint8)
    masks[:, height // 3: 2 * height // 3, width // 3: 2 * width // 3] = 255
    return video, masks


def bench_pipeline(height=720, width=1280, frames=38, max_img_size=960):
    """End-to-end run_infill_on_frames (the judged metric). Returns
    (end_to_end_fps, model_only_fps) from the same best run."""
    from videovanish_tpu.pipeline import infill
    from videovanish_tpu.utils.observability import collect_stages

    video, masks = synth_clip(height, width, frames)
    fr = list(video)
    mk = list(masks)

    # warmup: compiles every shape in the path (prior chunks + denoise)
    _ = infill.run_infill_on_frames(fr, mk, max_img_size=max_img_size)

    best, model_secs, best_stages = float("inf"), float("inf"), []
    for _ in range(REPEATS):
        stages = []
        with collect_stages(stages):
            t0 = time.perf_counter()
            out = infill.run_infill_on_frames(fr, mk,
                                              max_img_size=max_img_size)
            dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            best_stages = stages
            model_secs = sum(s for n, s, _ in stages
                             if n == "diffueraser_denoise") or float("inf")
    assert len(out) == frames and out[0].shape == (height, width, 3)
    return frames / best, frames / model_secs, best_stages


def bench_previews(height=720, width=1280, max_img_size=960):
    """Interactive-session latencies (BASELINE config 5): the reference
    GUI previews a 1-frame SAM2 mask (videovanish.py:1544) and a
    22-frame infill window (videovanish.py:1572). Warm-cache, best-of-2.
    Returns (mask_preview_s, infill_preview_s)."""
    from videovanish_tpu.pipeline import infill, masker

    video, masks = synth_clip(height, width, 24, seed=2)
    ann = {"keyframes": [{
        "frame_idx": 0,
        "pos_clicks": [{"x": 0.5, "y": 0.5, "obj": 1}],
        "neg_clicks": [], "rects": [],
    }]}

    def mask_once():
        return masker.run_sam2_on_frames([video[0]], ann)

    def infill_once():
        n = infill._get_config().diffueraser.clip_length  # preview N=22
        return infill.run_infill_on_frames(
            list(video[:n]), list(masks[:n]), max_img_size=max_img_size,
            preview=True)  # the GUI preview path: preview-tier res

    mask_once(), infill_once()  # warm every shape in both paths
    m_best = i_best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        mask_once()
        m_best = min(m_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        infill_once()
        i_best = min(i_best, time.perf_counter() - t0)
    return m_best, i_best


def bench_sam2(height=480, width=854, frames=48):
    """SAM2 prompted mask generation + propagation FPS, plus the
    per-sub-stage split (wire prep / encode dispatch / step dispatch /
    fetch — dispatch is async through the tunnel, so device time lands
    in the blocking fetch; VERDICT r2 item 7)."""
    from videovanish_tpu.pipeline import masker
    from videovanish_tpu.utils.observability import collect_stages

    rng = np.random.default_rng(1)
    video = (rng.random((frames, height, width, 3)) * 255).astype(np.uint8)
    ann = {"keyframes": [{
        "frame_idx": 0,
        "pos_clicks": [{"x": 0.5, "y": 0.5, "obj": 1}],
        "neg_clicks": [], "rects": [],
    }]}
    fr = list(video)
    _ = masker.run_sam2_on_frames(fr, ann)  # warmup/compile
    best, best_stages = float("inf"), []
    for _ in range(REPEATS):
        stages = []
        with collect_stages(stages):
            t0 = time.perf_counter()
            out = masker.run_sam2_on_frames(fr, ann)
            dt = time.perf_counter() - t0
        if dt < best:
            best, best_stages = dt, stages
    assert len(out) == frames
    split = {}
    for name, secs, fields in best_stages:
        if not name.startswith("sam2."):
            continue
        d = split.setdefault(name, {"seconds": 0.0, "calls": 0})
        d["seconds"] = round(d["seconds"] + secs, 3)
        d["calls"] += 1
        if "bytes" in fields:
            d["bytes"] = d.get("bytes", 0) + fields["bytes"]
    return frames / best, split


def bench_mfu_projection(height=720, width=1280, max_img_size=960):
    """One traced clip_length window -> per-program device split with
    MFU + the 8-chip projection under the pipeline's sharding model
    (utils/profiling.py). Returns (programs, projection, venue).
    Assumes the shape is already compiled (runs after bench_previews)."""
    import tempfile

    import jax

    from videovanish_tpu.pipeline import infill
    from videovanish_tpu.utils.profiling import (
        aggregate_programs, device_rows, parse_framework_op_stats,
        peak_tflops, project_multichip,
    )

    pcfg = infill._get_config().propainter
    frames_n = infill._get_config().diffueraser.clip_length
    video, masks = synth_clip(height, width, frames_n, seed=3)
    fr, mk = list(video), list(masks)
    infill.run_infill_on_frames(fr, mk, max_img_size=max_img_size)  # warm
    trace_dir = tempfile.mkdtemp(prefix="vv_bench_xprof_")
    jax.profiler.start_trace(trace_dir)
    infill.run_infill_on_frames(fr, mk, max_img_size=max_img_size)
    jax.profiler.stop_trace()
    rows = parse_framework_op_stats(trace_dir)
    dev, venue = device_rows(rows)
    progs = aggregate_programs(dev, peak_tf=peak_tflops())
    # window count of a production-length chunk (subvideo_length), not
    # of this short capture: the projection models the long-video path
    NL = min(pcfg.subvideo_length, pcfg.neighbor_length + 1)
    stride = max(1, pcfg.neighbor_length // 2)
    starts = list(range(0, max(pcfg.subvideo_length - NL, 0) + 1, stride))
    if starts[-1] != pcfg.subvideo_length - NL:
        starts.append(pcfg.subvideo_length - NL)
    proj = project_multichip(progs, n_chips=8, frames=frames_n,
                             n_windows=len(starts))
    return progs, proj, venue


def emit(metric, value, vs=None, **extra):
    print(json.dumps({
        "metric": metric, "value": round(value, 3),
        "unit": extra.pop("unit", "frames/sec"),
        "vs_baseline": round(vs if vs is not None else value / 10.0, 3),
        **extra,
    }), flush=True)


def _tpu_recovered(err, waits=(120, 300, 600)) -> bool:
    """The axon TPU worker occasionally crashes/restarts mid-run
    (jax surfaces UNAVAILABLE). It usually comes back within minutes;
    wait for a trivial program to answer before retrying the leg."""
    if "UNAVAILABLE" not in f"{type(err).__name__}: {err}":
        return False
    import jax
    import jax.numpy as jnp
    for wait in waits:
        time.sleep(wait)
        try:
            x = jnp.ones((256, 256), jnp.bfloat16)
            float(jnp.sum(jnp.dot(x, x)))
            print("[bench] TPU worker recovered; retrying", file=sys.stderr)
            return True
        except Exception:
            continue
    return False


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    # persistent jit cache: SD-sized remote compiles take minutes; cached
    # warmup keeps the whole bench inside the watchdog budget (timed
    # regions are unaffected — warmup is excluded from every metric)
    from videovanish_tpu.core.runtime import apply_compilation_cache
    apply_compilation_cache()
    configs = [
        (720, 1280, 38, 960),   # 720p, reference-default inference res
        (480, 854, 38, 960),    # 480p fallback
        (256, 256, 16, 256),    # smoke fallback
    ]
    last_err, done = None, False
    for h, w, t, mis in configs:
        for attempt in range(2):  # 2nd attempt only after worker recovery
            try:
                e2e_fps, model_fps, stages = bench_pipeline(h, w, t, mis)
                import jax
                from videovanish_tpu.pipeline.infill import _get_mesh
                mesh = _get_mesh()
                nd = len(jax.devices())
                emit(f"vanish_frames_per_sec_{h}p_{nd}chip", e2e_fps,
                     n_devices=nd,
                     mesh=None if mesh is None else
                     dict(zip(mesh.axis_names,
                              (int(s) for s in mesh.devices.shape))))
                _primary_emitted.set()
                emit(f"model_frames_per_sec_{h}p_{nd}chip", model_fps)
                # per-stage split of the best run, with bytes-on-the-wire
                # attribution for the upload stage (VERDICT r2 item 3)
                split = {}
                for name, secs, fields in stages:
                    d = split.setdefault(name, {"seconds": 0.0})
                    d["seconds"] = round(d["seconds"] + secs, 3)
                    for key in ("bytes_up", "wire", "fetch_bytes",
                                "dispatches", "windows", "synced"):
                        if key in fields:
                            d[key] = d.get(key, 0) + fields[key] \
                                if key in ("fetch_bytes", "dispatches",
                                           "windows") else fields[key]
                emit(f"stage_split_{h}p", sum(
                    v["seconds"] for v in split.values()), vs=0.0,
                    unit="seconds", stages=split)
                done = True
                break
            except Exception as e:  # worker crash / OOM: retry or shrink
                last_err = e
                print(f"[bench] {h}p config failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                if attempt == 0 and _tpu_recovered(e):
                    continue
                break
        if done:
            break
    if not done:
        emit("vanish_frames_per_sec_720p_1chip", 0.0, vs=0.0,
             error=f"{type(last_err).__name__}: {last_err}")
        _primary_emitted.set()
        return 1

    # secondary legs, cheapest first (VERDICT r4 item 2: round 4 lost
    # previews/MFU/link to the driver's kill because the order put the
    # expensive legs in the middle)
    try:
        up, down = probe_link()  # seconds
        emit("host_link_MBps", down, vs=0.0, unit="MB/s", up_MBps=up)
    except Exception as e:
        print(f"[bench] link probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        # interactive envelope (BASELINE config 5): GUI preview latencies
        mask_s, infill_s = bench_previews()
        emit("mask_preview_latency_720p", mask_s, vs=0.0, unit="seconds")
        emit("infill_preview_latency_720p", infill_s, vs=0.0,
             unit="seconds")
    except Exception as e:
        print(f"[bench] preview leg failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    for attempt in range(2):
        try:
            sam2_fps, sam2_split = bench_sam2()
            emit("sam2_mask_frames_per_sec_480p_1chip", sam2_fps,
                 stages=sam2_split)
            break
        except Exception as e:
            print(f"[bench] sam2 leg failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            if attempt == 0 and _tpu_recovered(e):
                continue
            break
    if _elapsed() > 0.75 * TOTAL_BUDGET_S:
        print(f"[bench] skipping MFU leg: {_elapsed():.0f}s elapsed of "
              f"{TOTAL_BUDGET_S}s budget", file=sys.stderr)
        return 0
    try:
        # per-program MFU + v5p-8 projection (VERDICT r3 item 8). The
        # device-limited projection models the measured device split
        # under the full-pipeline sharding design; wall-clock adds the
        # host edge, so the real multi-chip number sits between this
        # and the single-chip wall measurement.
        progs, proj, venue = bench_mfu_projection()
        emit("program_mfu_720p",
             sum(d["ms"] for d in progs.values()) / 1e3, vs=0.0,
             unit="seconds-device", venue=venue, programs=progs)
        emit("projected_vanish_fps_720p_8chip_device_limited",
             proj.get("projected_fps", 0.0), projection=proj)
    except Exception as e:
        print(f"[bench] mfu/projection leg failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
