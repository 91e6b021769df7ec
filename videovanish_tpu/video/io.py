"""Host video-codec I/O edge.

Semantics match the reference's tools.py exactly (tools.py:4-45):
frames are RGB uint8 HxWx3 in memory; reading windows with
start_frame/max_frames (decode-and-discard before start_frame, like the
reference — no codec-level seek so frame indexing is deterministic across
codecs); writing uses lossless FFV1 in .mkv, converts RGB->BGR, and
nearest-resizes to (W0, H0) on mismatch.

Everything past the decode boundary is device arrays; the codec itself
stays host-side C (OpenCV's bundled FFmpeg).
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in this image
    cv2 = None


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) is required for video codec I/O")


def load_video_frames_from_path(video_path, start_frame: int = 0,
                                max_frames: int = -1):
    """Load frames as a list of (H,W,3) RGB uint8 arrays. Returns (frames, fps).

    Mirrors reference tools.py:4-28 (BGR->RGB, windowing, non-empty assert).
    """
    _require_cv2()
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise AssertionError(f"Failed to open video: {video_path}")

    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx >= start_frame:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if max_frames > 0 and len(frames) >= max_frames:
                break
        idx += 1
    cap.release()
    if len(frames) == 0:
        raise AssertionError("No frames read")
    return frames, fps


def write_video_frames_to_path(out_video, frames, fps, H0: int, W0: int,
                               fourcc: str = "FFV1"):
    """Write RGB frames losslessly (FFV1/MKV by default; reference tools.py:30-45)."""
    _require_cv2()
    writer = cv2.VideoWriter(
        str(out_video), cv2.VideoWriter_fourcc(*fourcc), fps, (int(W0), int(H0))
    )
    if not writer.isOpened():
        raise AssertionError(
            "Failed to open VideoWriter (FFV1/MKV). Try MJPG or mp4v if needed."
        )
    n = 0
    for f in frames:
        f = np.asarray(f)
        f = cv2.cvtColor(f, cv2.COLOR_RGB2BGR)
        if f.shape[0] != H0 or f.shape[1] != W0:
            f = cv2.resize(f, (int(W0), int(H0)), interpolation=cv2.INTER_NEAREST)
        writer.write(f)
        n += 1
    writer.release()
    print(f"[ok] wrote {n} frames to {out_video}")


def probe_video(video_path):
    """Return (n_frames, fps, H, W) without decoding all frames."""
    _require_cv2()
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise AssertionError(f"Failed to open video: {video_path}")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS)
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    cap.release()
    return n, fps, h, w


class VideoFrameReader:
    """Streaming chunked reader for long videos (chunk-at-a-time, so a
    1000+-frame 720p video never fully materializes on host).

    Decode-and-discard windowing keeps parity with tools.py; chunks are
    yielded as (start_index_within_window, frames_list).
    """

    def __init__(self, video_path, start_frame: int = 0, max_frames: int = -1):
        _require_cv2()
        self.cap = cv2.VideoCapture(str(video_path))
        if not self.cap.isOpened():
            raise AssertionError(f"Failed to open video: {video_path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS)
        self.start_frame = start_frame
        self.max_frames = max_frames
        self._emitted = 0
        self._idx = 0

    def read_chunk(self, n: int):
        out = []
        while len(out) < n:
            if self.max_frames > 0 and self._emitted >= self.max_frames:
                break
            ok, frame = self.cap.read()
            if not ok:
                break
            if self._idx >= self.start_frame:
                out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                self._emitted += 1
            self._idx += 1
        return out

    def close(self):
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
