"""Training subsystem: loss decreases over steps on a learnable toy
objective, and train-state checkpoint/resume roundtrips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videovanish_tpu.config import tiny_config
from videovanish_tpu.core.mesh import make_mesh
from videovanish_tpu.models.diffueraser.brushnet import BrushNetModel
from videovanish_tpu.models.diffueraser.unet import UNetCondition
from videovanish_tpu.train.train_step import (
    TrainState, make_train_step, restore_train_state, save_train_state,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config().diffueraser
    unet = UNetCondition(
        in_channels=4, out_channels=4,
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        num_attention_heads=cfg.attention_head_dim,
        cross_attention_dim=cfg.cross_attention_dim)
    brushnet = BrushNetModel(
        in_channels=9, block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        num_attention_heads=cfg.attention_head_dim)
    mesh = make_mesh(jax.devices()[:8], model_parallel=2)

    key = jax.random.PRNGKey(0)
    B, T, h, w = 4, 2, 16, 16  # B divides the 4-wide data axis
    t_vec = jnp.zeros((B * T,), jnp.int32)
    txt = jnp.zeros((B * T, 77, cfg.cross_attention_dim))
    unet_p = unet.init(key, jnp.zeros((B * T, h, w, 4)), t_vec, txt, T)["params"]
    brush_p = brushnet.init(key, jnp.zeros((B * T, h, w, 9)), t_vec, txt,
                            T)["params"]
    batch = {
        "latents": jax.random.normal(key, (B, T, h, w, 4)),
        "masked_lat": jnp.zeros((B, T, h, w, 4)),
        "mask_lat": jnp.ones((B, T, h, w, 1)),
        "text_emb": jnp.zeros((B, 77, cfg.cross_attention_dim)),
    }
    return unet, brushnet, mesh, {"unet": unet_p, "brushnet": brush_p}, batch


class TestTrainStep:
    def test_loss_decreases(self, setup):
        unet, brushnet, mesh, params, batch = setup
        init_fn, step_fn = make_train_step(unet, brushnet, mesh,
                                           learning_rate=1e-3)
        state = init_fn(params)
        losses = []
        for i in range(4):
            state, loss = step_fn(state, batch, jax.random.PRNGKey(7))
            losses.append(float(loss))
        assert int(state.step) == 4
        assert np.isfinite(losses).all()
        # same rng/batch every step: the optimizer must make progress
        assert losses[-1] < losses[0], losses

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        unet, brushnet, mesh, params, batch = setup
        init_fn, step_fn = make_train_step(unet, brushnet, mesh)
        state = init_fn(params)
        state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        p = str(tmp_path / "train_ckpt")
        save_train_state(p, state)
        restored = restore_train_state(p, state)
        assert int(restored.step) == int(state.step)
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed state steps further without error
        s2, loss = step_fn(restored, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))


def test_remat_matches_non_remat(setup):
    """jax.checkpoint changes memory, not math: one step with remat must
    produce the same loss as without."""
    unet, brushnet, mesh, params, batch = setup
    import jax
    from videovanish_tpu.train.train_step import make_train_step
    init_a, step_a = make_train_step(unet, brushnet, mesh, remat=False)
    init_b, step_b = make_train_step(unet, brushnet, mesh, remat=True)
    sa = init_a(params)
    sb = init_b(params)
    _, la = step_a(sa, batch, jax.random.PRNGKey(3))
    _, lb = step_b(sb, batch, jax.random.PRNGKey(3))
    assert abs(float(la) - float(lb)) < 1e-5, (float(la), float(lb))
