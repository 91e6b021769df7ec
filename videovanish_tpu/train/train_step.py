"""Sharded diffusion training step for the DiffuEraser UNet(+BrushNet).

The reference is inference-only; a production framework also needs the
fine-tuning path (temporal-attention/BrushNet training). One jitted step:
epsilon-prediction MSE under the SD1.5 schedule, optax AdamW, with
  dp: batch (clips) over "data"
  tp: attention/MLP params over "model" (parallel/sharding.py rules)
  sp: the temporal axis rides the flattened batch through spatial
      modules (frames ride "data" inside a clip via batch flattening)
Collectives (psum of grads over "data", all-reduce of TP partials) are
emitted by pjit from the shardings — no hand-written comm.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


from videovanish_tpu.models.diffueraser.scheduler import NoiseSchedule
from videovanish_tpu.parallel.sharding import (
    batch_sharding, param_sharding_rules,
)
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_train_step(unet, brushnet, mesh, learning_rate: float = 1e-5,
                    weight_decay: float = 1e-2, remat: bool = False):
    """Returns (init_fn, step_fn) jitted over `mesh`.

    Batch dict (leading axis = clips, sharded over "data"):
      latents:    (B, T, h, w, 4)  clean target latents
      masked_lat: (B, T, h, w, 4)
      mask_lat:   (B, T, h, w, 1)
      text_emb:   (B, 77, D)
    remat=True rematerializes the BrushNet/UNet forwards in the backward
    pass (jax.checkpoint): ~30% more FLOPs for a large activation-memory
    cut — the standard TPU trade for bigger per-chip batches.
    """
    schedule = NoiseSchedule()
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)

    def loss_fn(params, batch, rng):
        B, T = batch["latents"].shape[:2]
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (B,), 0, schedule.num_train_timesteps)
        t_full = jnp.repeat(t, T)  # (B*T,)
        noise = jax.random.normal(k_n, batch["latents"].shape, jnp.float32)

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        def brush_fwd(bp, bsample, t_full, txt):
            return brushnet.apply({"params": bp},
                                  bsample.astype(brushnet.dtype), t_full,
                                  txt.astype(brushnet.dtype), T)

        def unet_fwd(up, x_t, t_full, txt, bd, bm, bu):
            return unet.apply({"params": up}, x_t.astype(unet.dtype), t_full,
                              txt.astype(unet.dtype), T,
                              brushnet_down=bd, brushnet_mid=bm,
                              brushnet_up=bu)

        if remat:
            brush_fwd = jax.checkpoint(brush_fwd)
            unet_fwd = jax.checkpoint(unet_fwd)

        x0 = flat(batch["latents"])
        x_t = schedule.add_noise(x0, flat(noise), t_full)
        bsample = jnp.concatenate(
            [x_t, flat(batch["masked_lat"]), flat(batch["mask_lat"])], axis=-1)
        txt = jnp.repeat(batch["text_emb"], T, axis=0)
        bd, bm, bu = brush_fwd(params["brushnet"], bsample, t_full, txt)
        eps = unet_fwd(params["unet"], x_t, t_full, txt, bd, bm, bu)
        err = eps.astype(jnp.float32) - flat(noise)
        return jnp.mean(jnp.square(err))

    def init_fn(params):
        shardings = {
            "unet": param_sharding_rules(params["unet"], mesh),
            "brushnet": param_sharding_rules(params["brushnet"], mesh),
        }
        params = jax.device_put(params, shardings)
        # optimizer moments inherit the param shardings through jit
        opt_state = jax.jit(tx.init)(params)
        return TrainState(jnp.zeros((), jnp.int32), params, opt_state)

    def step_fn(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    def batch_shardings(batch):
        return {
            k: batch_sharding(mesh, v.ndim, axis=0) for k, v in batch.items()
        }

    def jitted_step(state, batch, rng):
        step = jax.jit(
            step_fn,
            in_shardings=(None, batch_shardings(batch),
                          NamedSharding(mesh, P())),
        )
        return step(state, batch, rng)

    return init_fn, jitted_step


def save_train_state(path: str, state: TrainState) -> None:
    """Persist a training run (params + optimizer moments + step) with
    orbax — the training-side checkpoint/resume story (SURVEY.md §5:
    the reference persists nothing)."""
    from videovanish_tpu.core.checkpoint import save_pytree
    save_pytree(path, {"step": state.step, "params": state.params,
                       "opt_state": state.opt_state})


def restore_train_state(path: str, like: TrainState) -> TrainState:
    from videovanish_tpu.core.checkpoint import load_pytree
    tree = load_pytree(path, like={"step": like.step, "params": like.params,
                                   "opt_state": like.opt_state})
    return TrainState(tree["step"], tree["params"], tree["opt_state"])
