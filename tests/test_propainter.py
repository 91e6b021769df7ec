"""ProPainter family: published image-propagation semantics on synthetic
scenes (known flow => exact fill), flow-completion driver behavior, and
the full Propainter forward with the tiny config.

Architecture parity vs torch oracles lives in test_propainter_oracle.py;
these tests cover functional behavior of the assembled pipeline.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from videovanish_tpu.config import tiny_config
from videovanish_tpu.models.propainter.propagation import (
    binary_mask, fb_consistency_check, image_propagation,
)


class TestImagePropagation:
    def test_static_scene_exact_fill(self, rng):
        """Static scene, zero flow: holes fill exactly from frame 0."""
        T, H, W = 4, 16, 16
        base = rng.random((H, W, 3)).astype(np.float32)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[1:, 4:10, 4:10] = 1.0  # hole in frames 1..3
        content = np.stack([base] * T) * (1 - masks)
        flows = np.zeros((T - 1, H, W, 2), np.float32)

        filled, remaining = image_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(flows))
        filled = np.asarray(filled)
        np.testing.assert_allclose(filled[2, 4:10, 4:10], base[4:10, 4:10],
                                   atol=1e-5)
        assert np.asarray(remaining).max() < 1e-5

    def test_backward_fill_from_future(self, rng):
        """Hole in early frames, content known only in the last frame:
        the backward (future -> past) pass must fill it."""
        T, H, W = 3, 12, 12
        base = rng.random((H, W, 3)).astype(np.float32)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[:2, 3:8, 3:8] = 1.0
        content = np.stack([base] * T) * (1 - masks)
        flows = np.zeros((T - 1, H, W, 2), np.float32)
        filled, _ = image_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(flows))
        np.testing.assert_allclose(np.asarray(filled)[0, 3:8, 3:8],
                                   base[3:8, 3:8], atol=1e-5)

    def test_unreachable_hole_stays(self):
        """Hole present in every frame: nothing to propagate from."""
        T, H, W = 3, 12, 12
        masks = np.ones((T, H, W, 1), np.float32)
        content = np.zeros((T, H, W, 3), np.float32)
        flows = np.zeros((T - 1, H, W, 2), np.float32)
        _, remaining = image_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows), jnp.asarray(flows))
        assert np.asarray(remaining).min() > 0.99

    def test_inconsistent_flow_blocks_fill(self, rng):
        """Where forward/backward flows disagree, the consistency check
        must veto propagation (published fbConsistencyCheck)."""
        T, H, W = 2, 12, 12
        base = rng.random((H, W, 3)).astype(np.float32)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[1, 3:8, 3:8] = 1.0
        content = np.stack([base] * T) * (1 - masks)
        flows_f = np.zeros((T - 1, H, W, 2), np.float32)
        flows_b = np.full((T - 1, H, W, 2), 9.0, np.float32)  # inconsistent
        _, remaining = image_propagation(
            jnp.asarray(content), jnp.asarray(masks),
            jnp.asarray(flows_f), jnp.asarray(flows_b))
        # hole could not be filled (check failed both directions)
        assert np.asarray(remaining)[1, 4:7, 4:7].min() > 0.99

    def test_fb_consistency_check_basic(self):
        H, W = 8, 8
        zero = jnp.zeros((1, H, W, 2))
        assert float(fb_consistency_check(zero, zero).min()) == 1.0
        big = jnp.full((1, H, W, 2), 5.0)
        assert float(fb_consistency_check(big, big).max()) == 0.0
        assert np.asarray(binary_mask(jnp.asarray([[0.05, 0.5]]))
                          ).tolist() == [[0.0, 1.0]]


class TestFusedPropWarp:
    @pytest.mark.parametrize("mode", ["nearest", "bilinear"])
    def test_bitwise_vs_separate_warps(self, rng, mode):
        """fused_prop_warp must equal the three separate flow_warp ops
        BITWISE (the propagation re-binarizes at thresholds, so even ULP
        drift could flip decisions). Flows include far-out-of-bounds
        displacements and exact .5 fractions (round-half-even path)."""
        from videovanish_tpu.ops.flow import (
            flow_warp, flow_warp_mode, fused_prop_warp,
        )
        B, H, W, C = 2, 13, 17, 3
        feat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        mask = jnp.asarray(rng.random((B, H, W, 1)) > 0.5, jnp.float32)
        chk = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 3,
                          jnp.float32)
        flow = rng.standard_normal((B, H, W, 2)).astype(np.float32) * 4
        flow[0, :3] = 100.0       # far OOB
        flow[0, 3:5] = -37.0      # far OOB negative
        flow[1, :2, :, :] = 0.5   # exact half fractions
        flow[1, 2:4, :, :] = -0.5
        flow = jnp.asarray(flow)

        f_ref = flow_warp_mode(feat, flow, mode)
        m_ref = flow_warp(mask, flow)
        c_ref = flow_warp(chk, flow)
        f_out, m_out, c_out = fused_prop_warp(feat, mask, chk, flow, mode)
        np.testing.assert_array_equal(np.asarray(f_out), np.asarray(f_ref))
        np.testing.assert_array_equal(np.asarray(m_out), np.asarray(m_ref))
        np.testing.assert_array_equal(np.asarray(c_out), np.asarray(c_ref))


class TestFlowCompletionDriver:
    def test_passthrough_outside_mask(self, rng):
        """forward_bidirect_flow: outside holes, the (unmasked) input
        flow passes through bit-exact."""
        import jax
        from videovanish_tpu.models.propainter.flow_completion import (
            RecurrentFlowCompleteNet,
        )
        m = RecurrentFlowCompleteNet(base=8)
        T, H, W = 3, 16, 16
        ff = (rng.standard_normal((T - 1, H, W, 2)) * 3).astype(np.float32)
        fb = (rng.standard_normal((T - 1, H, W, 2)) * 3).astype(np.float32)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[:, 4:8, 4:8] = 1.0
        p = m.init(jax.random.PRNGKey(0), jnp.asarray(ff[:1]),
                   jnp.asarray(masks[:1]))["params"]
        out_f, out_b = m.apply({"params": p}, jnp.asarray(ff),
                               jnp.asarray(fb), jnp.asarray(masks),
                               method=m.forward_bidirect_flow)
        hole = masks[:-1, ..., 0] > 0
        np.testing.assert_allclose(np.asarray(out_f)[~hole], ff[~hole],
                                   atol=1e-6)


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


class TestFullSizeInit:
    def test_shape_only_init_constructs(self):
        """Full-size configs take the eval_shape (shape-only) init path,
        which must not abstract the generator's static l_t frame count
        into a tracer (regression: bench.py's default-config Propainter
        crashed with 'Slice entries must be static integers')."""
        from videovanish_tpu.config import default_config
        from videovanish_tpu.models.propainter import Propainter
        pp = Propainter(config=default_config().propainter)
        assert set(pp.params) == {"raft", "flow_comp", "generator"}
        import jax
        n = sum(x.size for x in jax.tree.leaves(pp.params))
        assert n > 10_000_000  # full-size nets, not tiny
