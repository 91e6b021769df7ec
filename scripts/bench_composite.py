#!/usr/bin/env python3
"""Isolate the rescale_composite stage (VERDICT r4 item 3: BENCH_r03
0.236 s -> BENCH_r04 1.12 s for the same 38-frame 720p clip).

Times the exact _host_composite work — cv2 INTER_LINEAR upscale from the
960-long-side model resolution back to 720p, plus the native bbox-
windowed feather composite — on synthetic frames matching bench.py's
clip, split per sub-step. Pure host CPU: no TPU needed.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2

    from videovanish_tpu.pipeline.infill import _host_composite, _native

    nat = _native()
    assert nat is not None, "native library unavailable"

    T, H0, W0 = 38, 720, 1280
    # model res: 960 long side -> 960x540, like bench.py's 720p clip
    h1, w1 = 540, 960
    rng = np.random.default_rng(0)
    frames = (rng.random((T, H0, W0, 3)) * 255).astype(np.uint8)
    inpainted = [(rng.random((h1, w1, 3)) * 255).astype(np.uint8)
                 for _ in range(T)]
    dil = np.zeros((T, H0, W0), np.uint8)
    dil[:, H0 // 3 - 8: 2 * H0 // 3 + 8, W0 // 3 - 8: 2 * W0 // 3 + 8] = 255

    for name, fn in [
        ("resize_only", lambda: [cv2.resize(inp, (W0, H0),
                                            interpolation=cv2.INTER_LINEAR)
                                 for inp in inpainted]),
        ("feather_only", lambda: [nat.feather_composite(
            frames[i], frames[i], dil[i], 3.0) for i in range(T)]),
        ("full_host_composite", lambda: _host_composite(
            nat, inpainted, frames, dil, 3.0, True)),
        ("full_no_keep", lambda: _host_composite(
            nat, inpainted, frames, dil, 3.0, False)),
    ]:
        fn()  # warm (page-in, cv2 thread pool)
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
            for _ in range(3))
        print(f"{name:22s} {best:7.3f}s  ({best / T * 1e3:.1f} ms/frame)")


if __name__ == "__main__":
    main()
