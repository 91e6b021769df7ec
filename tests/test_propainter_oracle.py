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


class TestDeformableAlignment:
    def test_modulated_deform_conv(self, rng):
        from videovanish_tpu.models.propainter.deform import (
            modulated_deform_conv2d,
        )
        B, H, W, Cin, Cout, G = 2, 10, 12, 32, 16, 4
        x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
        offset = (rng.standard_normal((B, 2 * G * 9, H, W)) * 2).astype(
            np.float32)
        mask = rng.random((B, G * 9, H, W)).astype(np.float32)
        weight = (rng.standard_normal((Cout, Cin, 3, 3)) * 0.1).astype(
            np.float32)
        bias = rng.standard_normal(Cout).astype(np.float32)
        with torch.no_grad():
            want = opp.modulated_deform_conv2d_ref(
                *(torch.from_numpy(a) for a in
                  (x, offset, mask, weight, bias))).numpy()
        off_j = offset.transpose(0, 2, 3, 1).reshape(B, H, W, G, 9, 2)
        got = modulated_deform_conv2d(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(off_j),
            jnp.asarray(mask.transpose(0, 2, 3, 1).reshape(B, H, W, G, 9)),
            jnp.asarray(weight.transpose(2, 3, 1, 0)), jnp.asarray(bias))
        np.testing.assert_allclose(from_jax(got), want, atol=1e-4)

    def test_modulated_deform_conv_far_offsets(self, rng):
        """Offsets scaled so most taps sample far outside the image —
        the corner-packed gather clips into its (H+1, W+1) table and
        must mask those corners to exact zeros like torchvision does."""
        from videovanish_tpu.models.propainter.deform import (
            modulated_deform_conv2d,
        )
        B, H, W, Cin, Cout, G = 1, 8, 9, 16, 8, 4
        x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
        offset = (rng.standard_normal((B, 2 * G * 9, H, W)) * 20).astype(
            np.float32)
        mask = rng.random((B, G * 9, H, W)).astype(np.float32)
        weight = (rng.standard_normal((Cout, Cin, 3, 3)) * 0.1).astype(
            np.float32)
        bias = rng.standard_normal(Cout).astype(np.float32)
        with torch.no_grad():
            want = opp.modulated_deform_conv2d_ref(
                *(torch.from_numpy(a) for a in
                  (x, offset, mask, weight, bias))).numpy()
        off_j = offset.transpose(0, 2, 3, 1).reshape(B, H, W, G, 9, 2)
        got = modulated_deform_conv2d(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(off_j),
            jnp.asarray(mask.transpose(0, 2, 3, 1).reshape(B, H, W, G, 9)),
            jnp.asarray(weight.transpose(2, 3, 1, 0)), jnp.asarray(bias))
        np.testing.assert_allclose(from_jax(got), want, atol=1e-4)

    def test_alignment_module_parity(self, rng):
        from videovanish_tpu.models.propainter.deform import (
            SecondOrderDeformableAlignment as JAlign,
        )
        C, COND = 32, 70
        tm = opp.SecondOrderDeformableAlignment(C, C, COND, deform_groups=4,
                                                max_residue_magnitude=3.0
                                                ).eval()
        x = rng.standard_normal((1, C, 8, 10)).astype(np.float32)
        cond = rng.standard_normal((1, COND, 8, 10)).astype(np.float32)
        flow = (rng.standard_normal((1, 2, 8, 10)) * 3).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(cond),
                      torch.from_numpy(flow)).numpy()
        params = convert(tm, rules=[(r"(^|\.)conv_offset\.(\d)\.",
                                     r"\1conv_offset_\2.")])
        m = JAlign(out_channels=C, deform_groups=4)
        got = m.apply({"params": params},
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(cond.transpose(0, 2, 3, 1)),
                      jnp.asarray(flow.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(from_jax(got), want, atol=2e-4)


class TestFlowCompletion:
    def test_recurrent_flow_complete_parity(self, rng):
        """Whole RecurrentFlowCompleteNet: P3D encoder, dilated mid,
        deformable bidirectional propagation, deconv decoder — converted
        checkpoint-style keys through FLOWCOMP_RULES."""
        from videovanish_tpu.core.convert import FLOWCOMP_RULES
        from videovanish_tpu.models.propainter.flow_completion import (
            RecurrentFlowCompleteNet,
        )
        tm = opp.RecurrentFlowCompleteNet().eval()
        T, H, W = 4, 32, 40
        flows = (rng.standard_normal((1, T, 2, H, W)) * 4).astype(np.float32)
        masks = (rng.random((1, T, 1, H, W)) > 0.7).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(flows),
                      torch.from_numpy(masks)).numpy()

        params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()}, FLOWCOMP_RULES)
        m = RecurrentFlowCompleteNet()
        got = m.apply({"params": params},
                      jnp.asarray(flows[0].transpose(0, 2, 3, 1)),
                      jnp.asarray(masks[0].transpose(0, 2, 3, 1)))
        assert got.shape == (T, H, W, 2)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want[0], atol=1e-3)

    def test_forward_bidirect_flow_combines(self, rng):
        """Driver semantics: completed values only inside holes, the
        masked estimate passes through outside."""
        from videovanish_tpu.core.convert import FLOWCOMP_RULES
        from videovanish_tpu.models.propainter.flow_completion import (
            RecurrentFlowCompleteNet,
        )
        tm = opp.RecurrentFlowCompleteNet().eval()
        params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()}, FLOWCOMP_RULES)
        m = RecurrentFlowCompleteNet()
        T, H, W = 3, 16, 16
        ff = (rng.standard_normal((T - 1, H, W, 2)) * 3).astype(np.float32)
        fb = (rng.standard_normal((T - 1, H, W, 2)) * 3).astype(np.float32)
        masks = np.zeros((T, H, W, 1), np.float32)
        masks[:, 4:10, 4:10] = 1.0
        out_f, out_b = m.apply(
            {"params": params}, jnp.asarray(ff), jnp.asarray(fb),
            jnp.asarray(masks), method=m.forward_bidirect_flow)
        out_f = np.asarray(out_f)
        hole = masks[:-1, ..., 0] > 0
        # outside the hole: exactly the (unmasked) input flow
        np.testing.assert_allclose(out_f[~hole], ff[~hole], atol=1e-6)
        # inside: replaced by the network (overwhelmingly different)
        assert np.abs(out_f[hole] - ff[hole]).mean() > 0.1


class TestInpaintGenerator:
    def test_encoder_group_interleave(self, rng):
        from videovanish_tpu.models.propainter.inpaint_generator import (
            Encoder,
        )
        tm = opp.PPEncoder().eval()
        x = rng.standard_normal((2, 5, 32, 48)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        params = convert(tm, rules=[])
        got = Encoder().apply({"params": params["layers" if False else
                                               "layers"] if False else
                               {"layers_%d" % i: params[f"layers_{i}"]
                                for i in range(0, 18, 2)}},
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(from_jax(got), want, atol=2e-4)

    def test_soft_split_comp_roundtrip(self, rng):
        from videovanish_tpu.models.propainter.inpaint_generator import (
            SoftComp, SoftSplit,
        )
        tss = opp.SoftSplit(16, 64).eval()
        tsc = opp.SoftComp(16, 64).eval()
        T, H, W = 3, 24, 36
        x = rng.standard_normal((T, 16, H, W)).astype(np.float32)
        with torch.no_grad():
            mid = tss(torch.from_numpy(x), 1, (H, W))
            want = tsc(mid, T, (H, W)).numpy()
        p_ss = convert(tss, rules=[])
        p_sc = convert(tsc, rules=[])
        jss = SoftSplit(64).apply({"params": p_ss},
                                  jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(jss), mid[0].numpy(), atol=1e-4)
        got = SoftComp(16).apply({"params": p_sc}, jss, (H, W))
        np.testing.assert_allclose(from_jax(got), want, atol=1e-4)

    def test_sparse_window_attention(self, rng):
        from videovanish_tpu.models.propainter.inpaint_generator import (
            SparseWindowAttention,
        )
        tm = opp.SparseWindowAttention(64, 4, (5, 9), (4, 4)).eval()
        T, H, W = 4, 12, 20  # non-divisible by window: exercises padding
        x = rng.standard_normal((T, H, W, 64)).astype(np.float32)
        t_ind = [0, 2]
        with torch.no_grad():
            want = tm(torch.from_numpy(x), t_ind).numpy()
        params = convert(tm, rules=[])
        got = SparseWindowAttention(64, 4, (5, 9), (4, 4)).apply(
            {"params": params}, jnp.asarray(x), tuple(t_ind))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_fusion_feed_forward(self, rng):
        from videovanish_tpu.models.propainter.inpaint_generator import (
            FusionFeedForward,
        )
        tm = opp.FusionFeedForward(64, 245).eval()  # 245 = 5*49
        T, H, W = 2, 24, 30
        fh, fw = (H + 6 - 7) // 3 + 1, (W + 6 - 7) // 3 + 1
        x = rng.standard_normal((T, fh * fw, 64)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), (H, W)).numpy()
        params = convert(tm, rules=[(r"(^|\.)fc1\.0\.", r"\1fc1_0."),
                                    (r"(^|\.)fc2\.1\.", r"\1fc2_1.")])
        got = FusionFeedForward(64, 245).apply(
            {"params": params}, jnp.asarray(x.reshape(T, fh, fw, 64)),
            (H, W))
        np.testing.assert_allclose(np.asarray(got).reshape(T, -1, 64),
                                   want, atol=2e-4)

    def test_full_generator_parity(self, rng):
        """Whole InpaintGenerator with converted ProPainter.pth-style
        keys: encoder, flow-guided deformable propagation, 2 transformer
        blocks, soft comp, decoder."""
        from videovanish_tpu.core.convert import PROPAINTER_RULES
        from videovanish_tpu.models.propainter.inpaint_generator import (
            InpaintGenerator,
        )
        tm = opp.InpaintGenerator(depths=2).eval()
        T, l_t, H, W = 4, 3, 32, 48
        frames = (rng.random((1, T, 3, H, W)) * 2 - 1).astype(np.float32)
        flows_f = (rng.standard_normal((1, l_t - 1, 2, H, W)) * 2).astype(
            np.float32)
        flows_b = (rng.standard_normal((1, l_t - 1, 2, H, W)) * 2).astype(
            np.float32)
        m_in = (rng.random((1, T, 1, H, W)) > 0.8).astype(np.float32)
        m_upd = m_in * (rng.random((1, T, 1, H, W)) > 0.5)
        with torch.no_grad():
            want = tm(torch.from_numpy(frames),
                      (torch.from_numpy(flows_f), torch.from_numpy(flows_b)),
                      torch.from_numpy(m_in),
                      torch.from_numpy(m_upd.astype(np.float32)),
                      l_t).numpy()
        params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()}, PROPAINTER_RULES)
        m = InpaintGenerator(depths=2)
        got = m.apply(
            {"params": params},
            jnp.asarray(frames[0].transpose(0, 2, 3, 1)),
            (jnp.asarray(flows_f[0].transpose(0, 2, 3, 1)),
             jnp.asarray(flows_b[0].transpose(0, 2, 3, 1))),
            jnp.asarray(m_in[0].transpose(0, 2, 3, 1)),
            jnp.asarray(m_upd[0].transpose(0, 2, 3, 1).astype(np.float32)),
            l_t)
        assert got.shape == (l_t, H, W, 3)
        np.testing.assert_allclose(from_jax(got), want[0], atol=2e-3)
