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
                  num_train_timesteps: int = 1000,
                  original_inference_steps: int = 50) -> np.ndarray:
    """Phase-boundary timesteps for N-step consistency sampling.

    The published LCM/PCM derivation (Luo et al. 2023 §4.3, Wang et al.
    2024; diffusers LCMScheduler.set_timesteps): the consistency model is
    distilled against a grid of `original_inference_steps` teacher
    timesteps  t_i = i * (T // origin) - 1  for i = 1..origin; inference
    subsamples every (origin // N)-th of those from the end. For the
    reference-pinned "2-Step" (diffuerase.py:37) this yields [999, 499]
    — identical to naive uniform trailing spacing — but they diverge for
    N=4 ([999, 759, 519, 279] vs the naive [999, 749, 499, 249]).
    """
    if num_inference_steps > original_inference_steps:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} exceeds the "
            f"distillation grid ({original_inference_steps})")
    k = num_train_timesteps // original_inference_steps
    origin_ts = np.arange(1, original_inference_steps + 1) * k - 1
    skip = original_inference_steps // num_inference_steps
    ts = origin_ts[::-1][::skip][:num_inference_steps]
    return ts.astype(np.int32)


def ddim_timesteps(num_inference_steps: int,
                   num_train_timesteps: int = 1000) -> np.ndarray:
    """DDIM leading-spaced timesteps (diffusers default)."""
    step = num_train_timesteps // num_inference_steps
    return (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int32)


def boundary_scalings(t, timestep_scaling: float = 10.0,
                      sigma_data: float = 0.5):
    """LCM/PCM consistency boundary conditions c_skip(t), c_out(t)
    (Song et al. 2023 eq. 7 discretized as in Luo et al. 2023 app. D;
    diffusers LCMScheduler.get_scalings_for_boundary_condition_discrete):
        s = timestep_scaling * t
        c_skip = sigma_data^2 / (s^2 + sigma_data^2)
        c_out  = s / sqrt(s^2 + sigma_data^2)
    At SD timesteps (t >= 19) these are within f32 epsilon of (0, 1) —
    kept for literal fidelity to the published algorithm."""
    s = timestep_scaling * jnp.asarray(t, jnp.float32)
    c_skip = sigma_data ** 2 / (s ** 2 + sigma_data ** 2)
    c_out = s * jax.lax.rsqrt(s ** 2 + sigma_data ** 2)
    return c_skip, c_out


def consistency_step(schedule: NoiseSchedule, x_t, eps, t, t_next,
                     noise=None):
    """One PCM/LCM multistep transition.

    Predict x0 from eps at t, apply the consistency boundary scalings
    (denoised = c_out * x0 + c_skip * x_t), then move to t_next by
    re-noising: deterministic (PCM's published sampler — re-noise with
    the *predicted* eps, the DDIM eta=0 transition) when noise is None,
    stochastic (LCM-style fresh noise) when noise is given.
    t_next < 0 means final step -> return the denoised prediction.
    """
    x0 = schedule.pred_x0_from_eps(x_t, eps, t)
    c_skip, c_out = boundary_scalings(t)
    denoised = c_out * x0 + c_skip * x_t.astype(jnp.float32)
    def final(_):
        return denoised
    def renoise(_):
        src = eps.astype(jnp.float32) if noise is None else noise.astype(jnp.float32)
        a = schedule.sqrt_acp(t_next)
        s = schedule.sqrt_one_minus_acp(t_next)
        return a * denoised + s * src
    out = jax.lax.cond(t_next < 0, final, renoise, None)
    return out.astype(x_t.dtype)


def ddim_step(schedule: NoiseSchedule, x_t, eps, t, t_prev):
    """Deterministic DDIM step t -> t_prev (t_prev < 0 means x0)."""
    return consistency_step(schedule, x_t, eps, t, t_prev, noise=None)
