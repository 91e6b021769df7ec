#!/usr/bin/env python3
"""Capture an xprof trace of one denoise window and print the top-op table.

VERDICT r2 item 3b: publish per-op attribution for a 720p window so
optimization targets the #1 op instead of guesses. Usage:

    python scripts/profile_topops.py                 # 720p on the TPU
    VV_CONFIG=tiny VV_PLATFORM=cpu \
        python scripts/profile_topops.py --frames 4 --height 128 --width 160

Runs run_infill_on_frames once to warm every compile, then again under
jax.profiler.trace, parses the xplane with xprof's converter
(framework_op_stats: per-op device/host self time), prints a markdown
table of the top ops by device self-time, and appends nothing anywhere —
redirect stdout to docs/PROFILE_<res>.md to publish.

The axon tunnel caveat applies: through the remote-device transport the
device timeline may be empty (profiling runs on the worker, not here);
in that case the table degrades to host ops and says so — still useful
for host-side attribution, and exact on directly-attached TPU/CPU.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=0,
                    help="default: one clip_length window")
    ap.add_argument("--max-img-size", type=int, default=960)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None,
                    help="keep the raw trace here (default: tempdir)")
    ap.add_argument("--program", default=None,
                    help="also print an intra-program module x category "
                         "breakdown for this jit program "
                         "(e.g. denoise_window)")
    args = ap.parse_args()

    if os.environ.get("VV_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["VV_PLATFORM"])
    import jax
    import numpy as np

    # persistent jit cache (as bench.py): SD-sized remote compiles take
    # minutes; cached warmup makes repeat captures cheap
    from videovanish_tpu.core.runtime import apply_compilation_cache
    apply_compilation_cache()

    from videovanish_tpu.pipeline import infill

    frames = args.frames or infill._get_config().diffueraser.clip_length
    rng = np.random.default_rng(0)
    video = list((rng.random((frames, args.height, args.width, 3)) * 255)
                 .astype(np.uint8))
    masks = np.zeros((frames, args.height, args.width, 3), np.uint8)
    masks[:, args.height // 3: 2 * args.height // 3,
          args.width // 3: 2 * args.width // 3] = 255
    masks = list(masks)

    print(f"[profile] warmup {args.height}p x{frames} on "
          f"{jax.default_backend()}...", file=sys.stderr)
    infill.run_infill_on_frames(video, masks,
                                max_img_size=args.max_img_size)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="vv_xprof_")
    print(f"[profile] tracing into {trace_dir}", file=sys.stderr)
    jax.profiler.start_trace(trace_dir)
    infill.run_infill_on_frames(video, masks,
                                max_img_size=args.max_img_size)
    jax.profiler.stop_trace()

    from videovanish_tpu.utils.profiling import (
        aggregate_programs, device_rows, parse_framework_op_stats,
        peak_tflops, project_multichip,
    )
    rows = parse_framework_op_stats(trace_dir)
    cols = sorted(rows[0]) if rows else []
    dev, venue = device_rows(rows)
    if venue == "host":
        venue = "host (device timeline empty through the remote tunnel)"

    key = "total_self_time" if "total_self_time" in cols else \
        "self_time" if "self_time" in cols else "avg_self_time"
    dev.sort(key=lambda r: -float(r.get(key, 0) or 0))
    total = sum(float(r.get(key, 0) or 0) for r in dev) or 1.0

    print(f"# Top ops — {args.height}x{args.width}, {frames} frames, "
          f"backend={jax.default_backend()}, venue={venue}")
    print()
    print("| rank | op type | op name | self time | % of total | occ |")
    print("|---|---|---|---|---|---|")
    for i, r in enumerate(dev[: args.top]):
        st = float(r.get(key, 0) or 0)
        print(f"| {i + 1} | {r.get('type', '?')} "
              f"| `{str(r.get('operation', '?'))[:60]}` "
              f"| {st:,.0f} | {100 * st / total:.1f}% "
              f"| {r.get('occurrences', '?')} |")
    print()
    print(f"(self-time column: `{key}`; full gviz columns: {cols})")

    # per-program MFU split + the n-chip projection (VERDICT r3 item 8)
    peak = peak_tflops()
    progs = aggregate_programs(dev, peak_tf=peak)
    print()
    print(f"## Per-program device split (peak {peak:.0f} bf16 TFLOP/s)")
    print()
    print("| program | ms | % | MFU | serial (while) ms |")
    print("|---|---|---|---|---|")
    for prog, d in progs.items():
        print(f"| {prog} | {d['ms']:.0f} | {100 * d['share']:.1f}% "
              f"| {100 * d['mfu']:.1f}% | {d['serial_ms']:.0f} |")
    proj = project_multichip(progs, n_chips=8, frames=frames)
    print()
    print(f"8-chip projection (sharding model in utils/profiling.py): "
          f"{json.dumps(proj)}")

    if args.program:
        from videovanish_tpu.utils.profiling import breakdown_program
        groups = breakdown_program(dev, args.program, peak_tf=peak)
        print()
        print(f"## Inside `jit({args.program})` — by module x op category")
        print()
        print("| module | category | ms | % of program | MFU | occ |")
        print("|---|---|---|---|---|---|")
        for g in groups:
            print(f"| {g['module']} | {g['category']} | {g['ms']:.0f} "
                  f"| {100 * g['share']:.1f}% | {100 * g['mfu']:.1f}% "
                  f"| {g['occ']} |")


if __name__ == "__main__":
    main()
