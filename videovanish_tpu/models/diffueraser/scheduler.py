"""Diffusion schedules: PCM/LCM-style few-step consistency sampling + DDIM.

The reference pins the PCM "2-Step" checkpoint with guidance 0
(diffuerase.py:37,61) — a phased-consistency LoRA over SD1.5's
scaled-linear schedule. Everything here is precomputed f32 tables +
pure functions, so the whole denoise loop jit-compiles with static
step counts (no data-dependent control flow), and the deterministic
(eta=0) transition keeps chunk blending bitwise-stable (north star).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NoiseSchedule:
    """SD1.5 scaled-linear beta schedule tables (all f32 numpy, closed over
    by jitted fns as constants)."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    alphas_cumprod: np.ndarray = field(default=None, compare=False)

    def __post_init__(self):
        betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                            self.num_train_timesteps, dtype=np.float64) ** 2
        acp = np.cumprod(1.0 - betas).astype(np.float32)
        object.__setattr__(self, "alphas_cumprod", acp)

    # ---- pure helpers ----
    def sqrt_acp(self, t):
        return jnp.sqrt(jnp.asarray(self.alphas_cumprod)[t])

    def sqrt_one_minus_acp(self, t):
        return jnp.sqrt(1.0 - jnp.asarray(self.alphas_cumprod)[t])

    def add_noise(self, x0, noise, t):
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
        a = self.sqrt_acp(t).astype(jnp.float32)
        s = self.sqrt_one_minus_acp(t).astype(jnp.float32)
        while a.ndim < x0.ndim:
            a, s = a[..., None], s[..., None]
        return (a * x0.astype(jnp.float32)
                + s * noise.astype(jnp.float32)).astype(x0.dtype)

    def pred_x0_from_eps(self, x_t, eps, t):
        a = self.sqrt_acp(t).astype(jnp.float32)
        s = self.sqrt_one_minus_acp(t).astype(jnp.float32)
        while a.ndim < x_t.ndim:
            a, s = a[..., None], s[..., None]
        return (x_t.astype(jnp.float32) - s * eps.astype(jnp.float32)) / a


def pcm_timesteps(num_inference_steps: int,
                  num_train_timesteps: int = 1000) -> np.ndarray:
    """Phase-boundary timesteps for N-step consistency sampling:
    [999, 499] for 2 steps (LCM-style trailing spacing)."""
    step = num_train_timesteps // num_inference_steps
    ts = num_train_timesteps - 1 - step * np.arange(num_inference_steps)
    return ts.astype(np.int32)


def ddim_timesteps(num_inference_steps: int,
                   num_train_timesteps: int = 1000) -> np.ndarray:
    """DDIM leading-spaced timesteps (diffusers default)."""
    step = num_train_timesteps // num_inference_steps
    return (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int32)


def consistency_step(schedule: NoiseSchedule, x_t, eps, t, t_next,
                     noise=None):
    """One PCM/LCM multistep transition.

    Predict x0 from eps at t, then move to t_next by re-noising:
    deterministic (DDIM eta=0, using predicted eps) when noise is None,
    stochastic (LCM-style fresh noise) when noise is given.
    t_next < 0 means final step -> return x0 prediction.
    """
    x0 = schedule.pred_x0_from_eps(x_t, eps, t)
    def final(_):
        return x0
    def renoise(_):
        src = eps.astype(jnp.float32) if noise is None else noise.astype(jnp.float32)
        a = schedule.sqrt_acp(t_next)
        s = schedule.sqrt_one_minus_acp(t_next)
        return a * x0 + s * src
    out = jax.lax.cond(t_next < 0, final, renoise, None)
    return out.astype(x_t.dtype)


def ddim_step(schedule: NoiseSchedule, x_t, eps, t, t_prev):
    """Deterministic DDIM step t -> t_prev (t_prev < 0 means x0)."""
    return consistency_step(schedule, x_t, eps, t, t_prev, noise=None)
