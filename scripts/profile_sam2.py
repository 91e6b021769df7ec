#!/usr/bin/env python3
"""Capture an xprof trace of the SAM2 masking path and print the top-op
table + per-program split (VERDICT r4 item 5: all SAM2 device time hides
in the blocking sam2.fetch — this attributes it).

    python scripts/profile_sam2.py                 # 480p x 48 frames
    python scripts/profile_sam2.py --program encode_batch
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
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--program", default=None)
    args = ap.parse_args()

    if os.environ.get("VV_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["VV_PLATFORM"])
    import jax
    import numpy as np

    from videovanish_tpu.core.runtime import apply_compilation_cache
    apply_compilation_cache()

    from videovanish_tpu.pipeline import masker

    rng = np.random.default_rng(1)
    video = list((rng.random((args.frames, args.height, args.width, 3))
                  * 255).astype(np.uint8))
    ann = {"keyframes": [{
        "frame_idx": 0,
        "pos_clicks": [{"x": 0.5, "y": 0.5, "obj": 1}],
        "neg_clicks": [], "rects": [],
    }]}

    print(f"[profile] warmup sam2 {args.height}p x{args.frames} on "
          f"{jax.default_backend()}...", file=sys.stderr)
    masker.run_sam2_on_frames(video, ann)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="vv_xprof_sam2_")
    print(f"[profile] tracing into {trace_dir}", file=sys.stderr)
    jax.profiler.start_trace(trace_dir)
    masker.run_sam2_on_frames(video, ann)
    jax.profiler.stop_trace()

    from videovanish_tpu.utils.profiling import (
        aggregate_programs, breakdown_program, device_rows,
        parse_framework_op_stats, peak_tflops,
    )
    rows = parse_framework_op_stats(trace_dir)
    dev, venue = device_rows(rows)
    key = "total_self_time"
    dev.sort(key=lambda r: -float(r.get(key, 0) or 0))
    total = sum(float(r.get(key, 0) or 0) for r in dev) or 1.0

    print(f"# SAM2 top ops — {args.height}x{args.width}, "
          f"{args.frames} frames, backend={jax.default_backend()}, "
          f"venue={venue}")
    print()
    print("| rank | op type | op name | self us | % | occ |")
    print("|---|---|---|---|---|---|")
    for i, r in enumerate(dev[: args.top]):
        st = float(r.get(key, 0) or 0)
        print(f"| {i + 1} | {r.get('type', '?')} "
              f"| `{str(r.get('operation', '?'))[:70]}` "
              f"| {st:,.0f} | {100 * st / total:.1f}% "
              f"| {r.get('occurrences', '?')} |")

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

    if args.program:
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
