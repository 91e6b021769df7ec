"""Host->device staging: decode-ahead prefetching.

The reference decodes the entire video up front on the compute thread
(tools.py:4-28 via videovanish.py:1447). Here a decode thread runs ahead
of the TPU compute loop through the native bounded ring
(native/vvnative.cpp), so codec I/O overlaps device compute and host
memory stays bounded for 1000+-frame runs (SURVEY.md §7 hard-part #6).
"""
from __future__ import annotations

import threading

import numpy as np

from videovanish_tpu.video.io import VideoFrameReader


class PrefetchingFrameSource:
    """Iterate chunks of frames while a background thread decodes ahead.

    Falls back to synchronous decoding if the native library is
    unavailable.
    """

    def __init__(self, video_path, start_frame: int = 0, max_frames: int = -1,
                 prefetch_frames: int = 64):
        self.reader = VideoFrameReader(video_path, start_frame, max_frames)
        self.fps = self.reader.fps
        self._ring = None
        self._thread = None
        self._prefetch = prefetch_frames
        self._shape = None
        self._sync = False

    def _start(self, first: np.ndarray):
        try:
            from videovanish_tpu.native import FrameRing, available
            if not available():
                raise RuntimeError("native unavailable")
        except Exception:
            self._sync = True
            return
        self._shape = first.shape
        self._ring = FrameRing(self._prefetch, first.shape)
        self._ring.push(first)

        def decode_loop():
            while True:
                frames = self.reader.read_chunk(1)
                if not frames:
                    break
                if frames[0].shape != self._shape:
                    break
                if not self._ring.push(frames[0]):
                    break  # consumer closed
            self._ring.close()

        self._thread = threading.Thread(target=decode_loop, daemon=True)
        self._thread.start()

    def read_chunk(self, n: int) -> list[np.ndarray]:
        if self._sync:
            return self.reader.read_chunk(n)
        if self._ring is None:
            first = self.reader.read_chunk(1)
            if not first:
                return []
            self._start(first[0])
            if self._sync:  # fallback engaged
                rest = self.reader.read_chunk(n - 1)
                return first + rest
        out = []
        while len(out) < n:
            f = self._ring.pop()
            if f is None:
                break
            out.append(f)
        return out

    def close(self):
        if self._ring is not None:
            self._ring.close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.reader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
