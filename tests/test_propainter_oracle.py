"""ProPainter stack vs hand-written torch oracles with converted weights.

VERDICT r1 item 2: the prior needs a real weight-porting path. These
tests gate each flax module against tests/oracles_propainter.py (the
published architectures with checkpoint-style state-dict keys) after
converting random torch weights through core/convert.py's rule sets —
the same playbook that validated SAM2 and the UNet.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import oracles_propainter as opp
from videovanish_tpu.core.convert import RAFT_RULES, convert_state_dict
from videovanish_tpu.models.propainter import raft as jraft


def to_jax_nchw(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def from_jax(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


def convert(module, rules=RAFT_RULES):
    state = {k: v for k, v in module.state_dict().items()}
    return convert_state_dict(state, rules)


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)


class TestRaftModules:
    def test_basic_encoder_instance(self, rng):
        tm = opp.BasicEncoder(64, "instance").eval()
        x = rng.standard_normal((2, 3, 32, 40)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        params = convert(tm)
        m = jraft.BasicEncoder(64, "instance")
        got = m.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(from_jax(got), want, atol=2e-4)

    def test_basic_encoder_batch_uses_running_stats(self, rng):
        tm = opp.BasicEncoder(48, "batch")
        # randomize running stats so eval mode is distinguishable
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
        tm = tm.eval()
        x = rng.standard_normal((1, 3, 16, 24)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        params = convert(tm)
        m = jraft.BasicEncoder(48, "batch")
        got = m.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(from_jax(got), want, atol=2e-4)

    def test_corr_volume_and_lookup(self, rng):
        """The TPU lookup (volume einsum + row-gather + one-hot select +
        shared-floor bilinear) must equal torch's grid_sample lookup,
        including the published channel-order quirk and zero padding."""
        b, c, h, w = 2, 32, 24, 32  # every pyramid level must keep
        # Hl,Wl >= 2 (torch's align_corners grid divides by Hl-1)
        f1 = rng.standard_normal((b, c, h, w)).astype(np.float32)
        f2 = rng.standard_normal((b, c, h, w)).astype(np.float32)
        # coords: wild values incl. far out-of-range to hit zero padding
        coords = (rng.standard_normal((b, 2, h, w)) * 6.0).astype(np.float32)
        coords[:, 0] += np.arange(w)[None, None, :]
        coords[:, 1] += np.arange(h)[None, :, None]

        corr_fn = opp.CorrBlock(torch.from_numpy(f1), torch.from_numpy(f2),
                                num_levels=4, radius=4)
        with torch.no_grad():
            want = corr_fn(torch.from_numpy(coords)).numpy()

        vols = jraft.corr_volume_pyramid(
            jnp.asarray(f1.transpose(0, 2, 3, 1)),
            jnp.asarray(f2.transpose(0, 2, 3, 1)), 4)
        got = jraft.corr_lookup(vols,
                                jnp.asarray(coords.transpose(0, 2, 3, 1)), 4)
        np.testing.assert_allclose(from_jax(got), want, atol=3e-4)

    def test_update_block(self, rng):
        tm = opp.BasicUpdateBlock().eval()
        b, h, w = 2, 8, 10
        net = rng.standard_normal((b, 128, h, w)).astype(np.float32)
        inp = rng.standard_normal((b, 128, h, w)).astype(np.float32)
        corr = rng.standard_normal((b, 324, h, w)).astype(np.float32)
        flow = rng.standard_normal((b, 2, h, w)).astype(np.float32)
        with torch.no_grad():
            net_t, mask_t, df_t = tm(*(torch.from_numpy(a) for a in
                                       (net, inp, corr, flow)))
        params = convert(tm)
        m = jraft.BasicUpdateBlock()
        net_j, mask_j, df_j = m.apply(
            {"params": params},
            *(jnp.asarray(a.transpose(0, 2, 3, 1)) for a in
              (net, inp, corr, flow)))
        np.testing.assert_allclose(from_jax(net_j), net_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(from_jax(mask_j), mask_t.numpy(),
                                   atol=2e-5)
        np.testing.assert_allclose(from_jax(df_j), df_t.numpy(), atol=2e-5)

    def test_upsample_flow_convex(self, rng):
        flow = rng.standard_normal((2, 2, 6, 8)).astype(np.float32)
        mask = rng.standard_normal((2, 576, 6, 8)).astype(np.float32)
        tm = opp.RAFT.__new__(opp.RAFT)  # only needs the static method
        with torch.no_grad():
            want = opp.RAFT.upsample_flow(
                tm, torch.from_numpy(flow), torch.from_numpy(mask)).numpy()
        got = jraft.upsample_flow_convex(
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
            jnp.asarray(mask.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(from_jax(got), want, atol=2e-5)


class TestRaftEndToEnd:
    def test_full_raft_parity(self, rng):
        """Whole-model: converted raft-things-style state dict, 4 GRU
        iterations, full-res convex-upsampled flow."""
        tm = opp.RAFT(iters=4).eval()
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
        # big enough that every pyramid level keeps Hl,Wl >= 2
        img1 = (rng.random((1, 3, 128, 160)) * 2 - 1).astype(np.float32)
        img2 = np.roll(img1, 2, axis=3) * 0.9 + 0.1 * rng.standard_normal(
            (1, 3, 128, 160)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(img1), torch.from_numpy(img2)).numpy()

        # checkpoint-style keys (DataParallel prefix) through RAFT_RULES
        state = {"module." + k: v for k, v in tm.state_dict().items()}
        params = convert_state_dict(state, RAFT_RULES)
        m = jraft.RAFT(iters=4)
        got = m.apply({"params": params},
                      jnp.asarray(img1.transpose(0, 2, 3, 1)),
                      jnp.asarray(img2.transpose(0, 2, 3, 1)))
        assert got.shape == (1, 128, 160, 2)
        np.testing.assert_allclose(from_jax(got), want, atol=5e-3)
