"""Parallelism: ring attention vs dense reference on the virtual 8-device
mesh; sharding rules; train-step dp x tp execution (SURVEY.md §2e —
designed-in parallelism the reference lacks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from videovanish_tpu.core.mesh import make_mesh


def dense_attention(q, k, v):
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


class TestRingAttention:
    @pytest.mark.parametrize("S", [16, 64])
    def test_matches_dense(self, rng, S):
        from videovanish_tpu.parallel.ring_attention import make_ring_attention
        mesh = make_mesh(jax.devices()[:8], model_parallel=1)
        B, H, D = 2, 3, 16
        q = rng.standard_normal((B, H, S, D)).astype(np.float32)
        k = rng.standard_normal((B, H, S, D)).astype(np.float32)
        v = rng.standard_normal((B, H, S, D)).astype(np.float32)
        fn = make_ring_attention(mesh)
        out = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        ref = dense_attention(q, k, v)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_works_on_submesh(self, rng):
        from videovanish_tpu.parallel.ring_attention import make_ring_attention
        mesh = make_mesh(jax.devices()[:4], model_parallel=1)
        q = rng.standard_normal((1, 2, 32, 8)).astype(np.float32)
        fn = make_ring_attention(mesh)
        out = np.asarray(fn(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q)))
        np.testing.assert_allclose(out, dense_attention(q, q, q), atol=2e-5)


class TestRingAttentionInUNet:
    def test_unet_ring_matches_dense(self, rng):
        """UNet with sequence-parallel temporal attention (ring over the
        data axis, heads over model) must match the unsharded UNet."""
        from videovanish_tpu.config import tiny_config
        from videovanish_tpu.models.diffueraser.unet import UNetCondition
        from jax.sharding import NamedSharding

        cfg = tiny_config().diffueraser
        mesh = make_mesh(jax.devices()[:8], model_parallel=2)  # data=4
        T, h8, w8 = 8, 8, 8
        unet = UNetCondition(block_out_channels=cfg.block_out_channels,
                             layers_per_block=cfg.layers_per_block,
                             num_attention_heads=cfg.attention_head_dim,
                             cross_attention_dim=cfg.cross_attention_dim)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (T, h8, w8, 4))
        txt = jax.random.normal(key, (T, 77, cfg.cross_attention_dim))
        t = jnp.zeros((T,), jnp.int32)
        params = unet.init(key, x, t, txt, T)["params"]
        ref = unet.apply({"params": params}, x, t, txt, T)

        ring = unet.clone(ring_mesh=mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(
            lambda p, x: ring.apply({"params": p}, x, t, txt, T))(params, xs)
        # 21 motion modules x 2 ring attentions each reorder the softmax
        # accumulation vs dense; measured max |err| ~1e-3 at f32
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)


class TestShardingRules:
    def test_attention_params_split_over_model(self):
        from videovanish_tpu.parallel.sharding import param_sharding_rules
        mesh = make_mesh(jax.devices()[:8], model_parallel=2)
        params = {
            "attn1": {"to_q": {"kernel": jnp.zeros((8, 8))},
                      "to_out_0": {"kernel": jnp.zeros((8, 8)),
                                   "bias": jnp.zeros((8,))}},
            "conv1": {"kernel": jnp.zeros((3, 3, 4, 8)),
                      "bias": jnp.zeros((8,))},
        }
        sh = param_sharding_rules(params, mesh)
        assert sh["attn1"]["to_q"]["kernel"].spec == P(None, "model")
        assert sh["attn1"]["to_out_0"]["kernel"].spec == P("model", None)
        assert sh["conv1"]["kernel"].spec == P()  # convs replicated

    def test_shard_params_places_on_mesh(self):
        from videovanish_tpu.parallel.sharding import shard_params
        mesh = make_mesh(jax.devices()[:8], model_parallel=2)
        params = {"to_q": {"kernel": jnp.ones((8, 16))}}
        out = shard_params(params, mesh)
        assert out["to_q"]["kernel"].sharding.spec == P(None, "model")


class TestDryrunMultichip:
    def test_graft_dryrun(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g
        g.dryrun_multichip(8)  # raises on any sharding/compile failure


class TestMeshInference:
    def test_diffueraser_spmd_matches_single_device(self, rng):
        """Frames sharded over the data axis: SPMD inference must agree
        with single-device inference (sequence parallelism over the clip,
        collectives inserted by pjit)."""
        from videovanish_tpu.config import tiny_config
        from videovanish_tpu.models.diffueraser import DiffuEraser
        cfg = tiny_config().diffueraser
        T, H, W = 8, 64, 64
        frames = [(rng.random((H, W, 3)) * 255).astype(np.uint8)
                  for _ in range(T)]
        masks = [np.zeros((H, W), np.uint8) for _ in range(T)]
        for m in masks:
            m[24:40, 24:40] = 255

        single = DiffuEraser(config=cfg, seed=0)
        ref = np.stack(single.forward(frames, masks, max_img_size=64))

        mesh = make_mesh(jax.devices()[:8], model_parallel=1)
        sharded = DiffuEraser(config=cfg, seed=0, mesh=mesh)
        out = np.stack(sharded.forward(frames, masks, max_img_size=64))
        # f32 reduction order may differ across shards -> off-by-one of
        # uint8 rounding at most
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


class TestMultiHostScaffolding:
    """SURVEY.md §5 distributed-backend row (VERDICT r1 item 9):
    jax.distributed entry point + DCN-aware mesh planning. True
    multi-process can't run on one host; these gate the shape logic and
    the single-process no-op path."""

    def test_initialize_noop_single_process(self, monkeypatch):
        from videovanish_tpu.core.mesh import initialize_distributed
        monkeypatch.delenv("VV_COORDINATOR", raising=False)
        assert initialize_distributed() is False
        assert initialize_distributed(num_processes=1) is False

    def test_plan_hybrid_mesh_shapes(self):
        from videovanish_tpu.core.mesh import plan_hybrid_mesh
        # v5p-8 x 4 slices, tp=2: model stays intra-slice
        dcn, ici = plan_hybrid_mesh(4, 8, model_parallel=2)
        assert dcn == (4, 1) and ici == (4, 2)
        dcn, ici = plan_hybrid_mesh(2, 4, model_parallel=1)
        assert dcn == (2, 1) and ici == (4, 1)

    def test_plan_rejects_tp_across_slices(self):
        import pytest
        from videovanish_tpu.core.mesh import plan_hybrid_mesh
        with pytest.raises(ValueError, match="span slices"):
            plan_hybrid_mesh(2, 4, model_parallel=8)
        with pytest.raises(ValueError, match="does not divide"):
            plan_hybrid_mesh(2, 6, model_parallel=4)

    def test_hybrid_mesh_single_slice_fallback(self):
        from videovanish_tpu.core.mesh import make_hybrid_mesh
        mesh = make_hybrid_mesh(n_slices=1, model_parallel=2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.shape["model"] == 2

    def test_hybrid_mesh_two_virtual_slices(self):
        """8 virtual CPU devices as 2 'slices' of 4: the hybrid path
        builds a (data=8, model=1) mesh with slice-contiguous order."""
        from videovanish_tpu.core.mesh import make_hybrid_mesh
        try:
            mesh = make_hybrid_mesh(n_slices=2, model_parallel=1)
        except Exception as e:  # mesh_utils needs real slice metadata
            import pytest
            pytest.skip(f"hybrid mesh unavailable on virtual devices: {e}")
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
