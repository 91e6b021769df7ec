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
