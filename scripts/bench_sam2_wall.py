#!/usr/bin/env python3
"""Wall-clock of the SAM2 masking leg (bench.py's sam2 metric) without
the rest of bench: warm, then best-of-3 run_sam2_on_frames at 480p x 48.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from videovanish_tpu.core.runtime import apply_compilation_cache
    apply_compilation_cache()

    import numpy as np

    from videovanish_tpu.pipeline import masker

    frames_n, h, w = 48, 480, 854
    rng = np.random.default_rng(1)
    video = list((rng.random((frames_n, h, w, 3)) * 255).astype(np.uint8))
    ann = {"keyframes": [{
        "frame_idx": 0,
        "pos_clicks": [{"x": 0.5, "y": 0.5, "obj": 1}],
        "neg_clicks": [], "rects": [],
    }]}
    t0 = time.perf_counter()
    masker.run_sam2_on_frames(video, ann)
    print(f"warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = masker.run_sam2_on_frames(video, ann)
        best = min(best, time.perf_counter() - t0)
    assert len(out) == frames_n
    print(f"sam2 {h}p x{frames_n}: {best:.3f}s wall, "
          f"{frames_n / best:.1f} f/s")


if __name__ == "__main__":
    main()
