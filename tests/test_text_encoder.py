"""CLIP text encoder: numerical parity vs the installed transformers
torch implementation with CONVERTED weights (SURVEY.md §4 gate)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from videovanish_tpu.core.convert import convert_state_dict
from videovanish_tpu.models.diffueraser.text_encoder import (
    CLIP_RULES, CLIP_SPECIAL, CLIPTextModel,
)


@pytest.fixture(scope="module")
def tiny_torch_clip():
    from transformers import CLIPTextConfig
    from transformers import CLIPTextModel as TorchCLIP
    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(0)
    return TorchCLIP(cfg).eval()


class TestCLIPParity:
    def test_hidden_states_match(self, tiny_torch_clip, rng):
        tm = tiny_torch_clip
        ids = rng.integers(0, 100, size=(2, 16)).astype(np.int64)
        with torch.no_grad():
            ref = tm(torch.from_numpy(ids)).last_hidden_state.numpy()

        params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()},
            CLIP_RULES, CLIP_SPECIAL)
        m = CLIPTextModel(vocab_size=100, max_positions=16, width=32,
                          layers=2, num_heads=4)
        out = m.apply({"params": params},
                      jnp.asarray(ids.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)

    def test_causal_mask_active(self, tiny_torch_clip, rng):
        """Changing a later token must not affect earlier positions."""
        tm = tiny_torch_clip
        params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()},
            CLIP_RULES, CLIP_SPECIAL)
        m = CLIPTextModel(vocab_size=100, max_positions=16, width=32,
                          layers=2, num_heads=4)
        ids = rng.integers(0, 100, size=(1, 8)).astype(np.int32)
        a = np.asarray(m.apply({"params": params}, jnp.asarray(ids)))
        ids2 = ids.copy()
        ids2[0, -1] = (ids2[0, -1] + 1) % 100
        b = np.asarray(m.apply({"params": params}, jnp.asarray(ids2)))
        np.testing.assert_allclose(a[0, :-1], b[0, :-1], atol=1e-6)
        assert not np.allclose(a[0, -1], b[0, -1])


class TestNullEmbedding:
    """VERDICT r1 item 4: `null_text_emb` must be the CLIP-encoded empty
    prompt, not random. Gate the derivation path end-to-end: torch CLIP
    -> convert_state_dict -> derive_null_text_emb vs torch on the same
    BOS + EOS-pad ids."""

    def test_null_emb_matches_torch_empty_prompt(self, tiny_torch_clip):
        from videovanish_tpu.models.diffueraser.text_encoder import (
            derive_null_text_emb,
        )
        tm = tiny_torch_clip
        params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()},
            CLIP_RULES, CLIP_SPECIAL)
        got = derive_null_text_emb(params, width=32, layers=2, num_heads=4,
                                   vocab_size=100, max_positions=16)
        ids = np.asarray([[98] + [99] * 15], np.int64)  # bos=V-2, eos=V-1
        with torch.no_grad():
            want = tm(torch.from_numpy(ids)).last_hidden_state.numpy()[0]
        assert got.shape == (16, 32) and got.dtype == np.float32
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_assemble_diffueraser_bundles_and_derives(self, tiny_torch_clip,
                                                      tmp_path):
        from videovanish_tpu.cli.convert import assemble_diffueraser
        from videovanish_tpu.core.checkpoint import load_pytree, save_pytree

        tm = tiny_torch_clip
        clip_params = convert_state_dict(
            {k: v for k, v in tm.state_dict().items()},
            CLIP_RULES, CLIP_SPECIAL)
        fake = {"w": np.ones((2, 2), np.float32)}
        paths = {}
        for name, tree in [("vae", fake), ("unet", fake),
                           ("brushnet", fake), ("clip", clip_params)]:
            paths[name] = str(tmp_path / name)
            save_pytree(paths[name], tree)

        out = str(tmp_path / "bundle")
        tree = assemble_diffueraser(paths["vae"], paths["unet"],
                                    paths["brushnet"], paths["clip"], out,
                                    clip_heads=4)
        assert set(tree) == {"vae", "unet", "brushnet", "null_text_emb"}
        assert tree["null_text_emb"].shape == (16, 32)
        loaded = load_pytree(out)
        np.testing.assert_array_equal(loaded["null_text_emb"],
                                      tree["null_text_emb"])
        # derivation inside assemble == direct derivation
        from videovanish_tpu.models.diffueraser.text_encoder import (
            derive_null_text_emb,
        )
        direct = derive_null_text_emb(clip_params, width=32, layers=2,
                                      num_heads=4, vocab_size=100,
                                      max_positions=16)
        np.testing.assert_allclose(tree["null_text_emb"], direct, atol=1e-6)
