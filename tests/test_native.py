"""Native C++ library: chamfer vs cv2 exact, dilation vs scipy,
composite vs the reference math, ring buffer threading, and the
prefetching frame source end-to-end."""
import threading

import numpy as np
import pytest

import cv2
import scipy.ndimage

from videovanish_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build failed")


class TestChamfer:
    def test_matches_cv2_exactly(self, rng):
        m = (rng.random((40, 56)) < 0.05)
        m = scipy.ndimage.binary_dilation(m, iterations=2)
        ref = cv2.distanceTransform((m * 255).astype(np.uint8),
                                    cv2.DIST_L2, 5)
        ours = native.chamfer_distance(m)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestDilate:
    @pytest.mark.parametrize("iters", [1, 3, 8])
    def test_matches_scipy(self, rng, iters):
        m = (rng.random((32, 48)) < 0.03)
        ref = scipy.ndimage.binary_dilation(m, iterations=iters)
        np.testing.assert_array_equal(native.binary_dilate(m, iters), ref)


class TestComposite:
    def test_matches_reference_math(self, rng):
        H, W = 40, 48
        inp = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        org = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        m = scipy.ndimage.binary_dilation(rng.random((H, W)) < 0.04,
                                          iterations=3)
        m_bin = (m * 255).astype(np.uint8)
        d_in = cv2.distanceTransform(m_bin, cv2.DIST_L2, 5)
        d_out = cv2.distanceTransform(cv2.bitwise_not(m_bin), cv2.DIST_L2, 5)
        alpha = np.clip(0.5 + (d_in - d_out) / 6.0, 0, 1)[..., None]
        ref = np.clip(np.rint(alpha * inp.astype(np.float32)
                              + (1 - alpha) * org.astype(np.float32)),
                      0, 255).astype(np.uint8)
        ours = native.feather_composite(inp, org, m, 3.0)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_feather_zero_hard_edges(self, rng):
        H, W = 16, 16
        inp = np.full((H, W, 3), 200, np.uint8)
        org = np.zeros((H, W, 3), np.uint8)
        m = np.zeros((H, W), np.uint8)
        m[4:8, 4:8] = 1
        out = native.feather_composite(inp, org, m, 0.0)
        assert (out[5, 5] == 200).all() and (out[0, 0] == 0).all()


class TestRing:
    def test_fifo_order_across_threads(self):
        ring = native.FrameRing(4, (8, 8, 3))
        frames = [np.full((8, 8, 3), i, np.uint8) for i in range(20)]

        def producer():
            for f in frames:
                ring.push(f)
            ring.close()

        t = threading.Thread(target=producer)
        t.start()
        got = []
        while True:
            f = ring.pop()
            if f is None:
                break
            got.append(int(f[0, 0, 0]))
        t.join()
        assert got == list(range(20))

    def test_capacity_bounds_queue(self):
        ring = native.FrameRing(2, (4, 4, 3))
        ring.push(np.zeros((4, 4, 3), np.uint8))
        ring.push(np.zeros((4, 4, 3), np.uint8))
        assert ring.qsize() == 2
        ring.close()
        assert ring.pop() is not None  # drains after close


class TestPrefetchingSource:
    def test_reads_all_frames_in_order(self, tmp_path, rng):
        from videovanish_tpu.video import write_video_frames_to_path
        from videovanish_tpu.video.staging import PrefetchingFrameSource
        T, H, W = 25, 32, 32
        frames = [np.full((H, W, 3), i * 7 % 256, np.uint8) for i in range(T)]
        p = str(tmp_path / "v.mkv")
        write_video_frames_to_path(p, frames, 24.0, H, W)
        got = []
        with PrefetchingFrameSource(p, prefetch_frames=8) as src:
            while True:
                c = src.read_chunk(6)
                if not c:
                    break
                got.extend(c)
        assert len(got) == T
        for i, f in enumerate(got):
            np.testing.assert_array_equal(f, frames[i])
