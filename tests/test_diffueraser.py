"""DiffuEraser model family: scheduler math, window planning, and the
tiny-config end-to-end forward (BASELINE.json config-1 smoke analog)."""
import numpy as np
import pytest

import jax.numpy as jnp

from videovanish_tpu.config import tiny_config
from videovanish_tpu.models.diffueraser.scheduler import (
    NoiseSchedule, consistency_step, pcm_timesteps, ddim_timesteps,
)
from videovanish_tpu.models.diffueraser.model import (
    DiffuEraser, make_window_plan, window_blend_weights,
)


class TestScheduler:
    def test_pcm_timesteps(self):
        np.testing.assert_array_equal(pcm_timesteps(2), [999, 499])
        # published LCM/PCM grid subsampling (origin=50), not naive
        # uniform spacing — see tests/test_scheduler_oracle.py
        np.testing.assert_array_equal(pcm_timesteps(4), [999, 759, 519, 279])

    def test_schedule_matches_diffusers_formula(self):
        s = NoiseSchedule()
        betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
        acp = np.cumprod(1 - betas)
        np.testing.assert_allclose(s.alphas_cumprod, acp, rtol=1e-5)

    def test_add_noise_pred_x0_roundtrip(self, rng):
        s = NoiseSchedule()
        x0 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        eps = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        t = jnp.array([500, 900])
        xt = s.add_noise(jnp.asarray(x0), jnp.asarray(eps), t)
        back = s.pred_x0_from_eps(xt, jnp.asarray(eps), t)
        np.testing.assert_allclose(np.asarray(back), x0, atol=1e-4)

    def test_consistency_final_step_returns_x0(self, rng):
        s = NoiseSchedule()
        x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        t = jnp.int32(499)
        xt = s.add_noise(jnp.asarray(x0), jnp.asarray(eps),
                         jnp.full((1,), 499))
        out = consistency_step(s, xt, jnp.asarray(eps), t, jnp.int32(-1))
        np.testing.assert_allclose(np.asarray(out), x0, atol=1e-4)


class TestWindowPlan:
    def test_short_video_single_window(self):
        assert make_window_plan(5, 8, 2) == [(0, 5)]

    @pytest.mark.parametrize("T,clip,ov", [(10, 8, 2), (48, 8, 2), (23, 8, 2),
                                           (100, 22, 6)])
    def test_full_coverage(self, T, clip, ov):
        plan = make_window_plan(T, clip, ov)
        covered = np.zeros(T, bool)
        for s, L in plan:
            assert L == clip and 0 <= s <= T - clip
            covered[s:s + L] = True
        assert covered.all()

    def test_blend_weights_positive(self):
        w = window_blend_weights(8, 2, False, False)
        assert (w > 0).all() and w[3] == 1.0 and w[0] < 1.0 and w[-1] < 1.0
        w0 = window_blend_weights(8, 2, True, False)
        assert w0[0] == 1.0


class TestDiffuEraserTiny:
    @pytest.fixture(scope="class")
    def model(self):
        return DiffuEraser(config=tiny_config().diffueraser, seed=0)

    def test_forward_shapes_and_determinism(self, model, rng):
        T, H, W = 10, 64, 48
        frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        masks = np.zeros((T, H, W), np.uint8)
        masks[:, 20:40, 10:30] = 255
        out1 = model.forward(list(frames), list(masks), max_img_size=64)
        assert len(out1) == T
        assert out1[0].shape == (64, 48, 3) and out1[0].dtype == np.uint8
        out2 = model.forward(list(frames), list(masks), max_img_size=64)
        np.testing.assert_array_equal(np.stack(out1), np.stack(out2))

    def test_forward_with_prior_and_rgb_mask(self, model, rng):
        T, H, W = 4, 40, 40
        frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        masks = np.zeros((T, H, W, 3), np.uint8)
        masks[:, 10:20, 10:20, 2] = 1
        prior = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        out = model.forward(list(frames), list(masks), prior_frames=list(prior),
                            max_img_size=40)
        assert len(out) == T and out[0].shape == (40, 40, 3)


class TestDevicePriorHandoff:
    def test_device_prior_matches_host_prior(self, rng):
        """A device-resident prior at the inference resolution matches
        the same prior passed as host frames to within 1 uint8 LSB (the
        two encode programs fuse the /255 normalization differently;
        each path is individually deterministic)."""
        import jax.numpy as jnp
        from videovanish_tpu.config import tiny_config
        from videovanish_tpu.models.diffueraser import DiffuEraser
        model = DiffuEraser(config=tiny_config().diffueraser,
                            init_mode="random")
        T, H, W = 4, 64, 64
        frames = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        masks = np.zeros((T, H, W), np.uint8)
        masks[:, 20:44, 20:44] = 255
        prior = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
        a = model.forward(list(frames), list(masks), list(prior),
                          max_img_size=64)
        b = model.forward(list(frames), list(masks), jnp.asarray(prior),
                          max_img_size=64)
        diff = np.abs(np.stack(a).astype(np.int16)
                      - np.stack(b).astype(np.int16))
        assert diff.max() <= 1, diff.max()
        # and the device path is itself deterministic
        c = model.forward(list(frames), list(masks), jnp.asarray(prior),
                          max_img_size=64)
        np.testing.assert_array_equal(np.stack(b), np.stack(c))


class TestClassifierFreeGuidance:
    def test_guidance_zero_matches_default_and_nonzero_differs(self, rng):
        """guidance_scale=None/0 is the reference behavior
        (diffuerase.py:61); a positive scale with a prompt runs real CFG."""
        import jax.numpy as jnp
        from videovanish_tpu.config import tiny_config
        from videovanish_tpu.models.diffueraser import DiffuEraser
        cfg = tiny_config().diffueraser
        fr = [(rng.random((64, 48, 3)) * 255).astype(np.uint8)
              for _ in range(4)]
        ms = [np.zeros((64, 48), np.uint8) for _ in range(4)]
        for m in ms:
            m[20:40, 10:30] = 255
        model = DiffuEraser(config=cfg, seed=0)
        o0 = np.stack(model.forward(fr, ms, max_img_size=64))
        o1 = np.stack(model.forward(fr, ms, max_img_size=64,
                                    guidance_scale=0))
        np.testing.assert_array_equal(o0, o1)
        pe = jnp.asarray(rng.standard_normal(
            (77, cfg.cross_attention_dim)).astype(np.float32) * 0.02)
        o2 = np.stack(model.forward(fr, ms, max_img_size=64,
                                    guidance_scale=3.5, prompt_embeds=pe))
        assert (o2 != o0).any()
