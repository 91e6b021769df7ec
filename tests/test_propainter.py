"""ProPainter family: propagation correctness on synthetic translating
content (known flow => exact fill), flow completion passthrough, and the
full Propainter forward with the tiny config."""
import numpy as np
import pytest

import jax.numpy as jnp

from videovanish_tpu.config import tiny_config
from videovanish_tpu.models.propainter.propagation import (
    bidirectional_propagation, propagate_one_direction,
)


class TestPropagation:
    def test_static_scene_exact_fill(self, rng):
        """Static scene, zero flow: a hole visible in frame 0 must be
        filled exactly from frame 0 in later frames."""
        T, H, W = 4, 16, 16
        base = rng.random((H, W, 3)).astype(np.float32)
        content = np.stack([base] * T)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[1:, 4:10, 4:10] = 1.0  # hole in frames 1..3
        content = content * (1 - masks)  # zero out holes
        flows = np.zeros((T - 1, H, W, 2), np.float32)

        filled, remaining = bidirectional_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(flows))
        filled = np.asarray(filled)
        np.testing.assert_allclose(filled[2, 4:10, 4:10], base[4:10, 4:10],
                                   atol=1e-5)
        assert np.asarray(remaining).max() < 1e-5

    def test_backward_fill_from_future(self, rng):
        """Hole in frame 0, content known only in the last frame."""
        T, H, W = 3, 12, 12
        base = rng.random((H, W, 3)).astype(np.float32)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[:2, 3:8, 3:8] = 1.0
        content = np.stack([base] * T) * (1 - masks)
        flows = np.zeros((T - 1, H, W, 2), np.float32)
        filled, remaining = bidirectional_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(flows))
        np.testing.assert_allclose(np.asarray(filled)[0, 3:8, 3:8],
                                   base[3:8, 3:8], atol=1e-5)

    def test_unreachable_hole_stays(self, rng):
        """Hole present in every frame: nothing to propagate from."""
        T, H, W = 3, 12, 12
        masks = np.ones((T, H, W, 1), np.float32)
        content = np.zeros((T, H, W, 3), np.float32)
        flows = np.zeros((T - 1, H, W, 2), np.float32)
        _, remaining = bidirectional_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(flows))
        assert np.asarray(remaining).min() > 0.99


class TestFlowCompletion:
    def test_passthrough_outside_mask(self, rng):
        from videovanish_tpu.models.propainter.flow_completion import (
            FlowCompletion,
        )
        import jax
        fc = FlowCompletion(ch=8)
        flow = rng.standard_normal((1, 16, 16, 2)).astype(np.float32) * 3
        mask = np.zeros((1, 16, 16, 1), np.float32)
        mask[:, 4:8, 4:8] = 1.0
        p = fc.init(jax.random.PRNGKey(0), jnp.asarray(flow),
                    jnp.asarray(mask))["params"]
        out = np.asarray(fc.apply({"params": p}, jnp.asarray(flow),
                                  jnp.asarray(mask)))
        outside = mask[..., 0] == 0
        np.testing.assert_allclose(out[outside], flow[outside], atol=1e-5)


class TestPropainterTiny:
    def test_forward_end_to_end(self, rng):
        from videovanish_tpu.models.propainter import Propainter
        pp = Propainter(config=tiny_config().propainter)
        T, H, W = 6, 64, 64
        base = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        frames = [base.copy() for _ in range(T)]
        masks = []
        for t in range(T):
            m = np.zeros((H, W), np.uint8)
            if t > 0:
                m[20:40, 20:40] = 255
            masks.append(m)
        out = pp.forward(frames, masks, subvideo_length=4)
        assert len(out) == T and out[0].shape == (H, W, 3)
        assert out[0].dtype == np.uint8
        # unmasked pixels preserved exactly
        np.testing.assert_array_equal(out[0], base)
        np.testing.assert_array_equal(out[3][:10, :10], base[:10, :10])

    def test_single_frame_with_internal_resize(self, rng):
        """T=1 mean-fill path at a size that triggers the internal
        resize (regression: it used to mix the resized mask with the
        full-resolution frames and crash)."""
        from videovanish_tpu.models.propainter import Propainter
        pp = Propainter(config=tiny_config().propainter)
        H, W = 300, 300  # not a multiple of 8 -> plan_long_side differs
        f = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        m = np.zeros((H, W), np.uint8)
        m[100:150, 100:150] = 255
        out = pp.forward([f], [m])
        assert len(out) == 1 and out[0].shape == (H, W, 3)
        np.testing.assert_array_equal(out[0][:50, :50], f[:50, :50])
        assert (out[0][100:150, 100:150] != f[100:150, 100:150]).any()
