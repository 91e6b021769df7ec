"""CLIP text encoder (SD1.5 conditioning), flax.linen.

The reference pins guidance to 0 with an empty prompt (diffuerase.py:61),
so inference only needs the null-prompt embedding (stored with the
converted weights). This full encoder makes the framework promptable —
prompt-guided inpainting, CFG — and provides the embedding at weight-
conversion time. Architecture: the public CLIP ViT-L/14 text tower
(12 layers, 768 wide, 12 heads, causal mask, quick-gelu), consumed by
the reference through diffusers/transformers [external, SURVEY.md §2c].
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from videovanish_tpu.ops.attention import attention as flash_attention


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = True):
        B, S, C = x.shape
        hd = C // self.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x)

        def heads(t):
            return t.reshape(B, S, self.num_heads, hd).transpose(0, 2, 1, 3)

        out = flash_attention(heads(q), heads(k), heads(v), is_causal=causal,
                              backend="xla")
        out = out.transpose(0, 2, 1, 3).reshape(B, S, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(x.dtype)
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype,
                              name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(x.dtype)
        C = x.shape[-1]
        h = nn.Dense(C * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h)
        # CLIP uses quick-gelu: x * sigmoid(1.702 x)
        hf = h.astype(jnp.float32)
        h = (hf * nn.sigmoid(1.702 * hf)).astype(x.dtype)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    vocab_size: int = 49408
    max_positions: int = 77
    width: int = 768
    layers: int = 12
    num_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: (B, S) int32. Returns (B, S, width) final hidden
        states (what SD1.5 cross-attends to)."""
        B, S = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_positions, self.width))
        x = tok + pos[None, :S].astype(tok.dtype)
        for i in range(self.layers):
            x = CLIPLayer(self.num_heads, dtype=self.dtype,
                          name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="final_layer_norm")(x)
        return x.astype(self.dtype)


def derive_null_text_emb(clip_params, width: int = 768, layers: int = 12,
                         num_heads: int = 12, vocab_size: int = 49408,
                         max_positions: int = 77):
    """Encode the empty prompt with a converted CLIP text encoder.

    Returns (77, width) f32 — the real `null_text_emb` the reference's
    guidance-0 pipeline conditions on (diffuerase.py:41-44,61), replacing
    the random placeholder used before weights are ported. Runs on CPU
    shapes; called once at checkpoint-assembly time (cli/convert.py)."""
    model = CLIPTextModel(vocab_size=vocab_size, max_positions=max_positions,
                          width=width, layers=layers, num_heads=num_heads)
    # empty prompt = BOS + EOS-padding; CLIP vocabs place the specials at
    # the end (bos = V-2, eos = V-1; 49406/49407 for the published vocab,
    # tokenizer.null_text_ids), which generalizes to tiny test vocabs.
    ids = np.asarray([vocab_size - 2] + [vocab_size - 1] * (max_positions - 1),
                     np.int32)
    ids = jnp.asarray(ids)[None]
    out = model.apply({"params": clip_params}, ids)
    return np.asarray(out[0], np.float32)


# transformers CLIPTextModel state-dict -> this module (core/convert.py)
CLIP_RULES = [
    (r"^text_model\.embeddings\.token_embedding\.", "token_embedding."),
    (r"^text_model\.embeddings\.position_embedding\.weight$",
     "position_embedding"),
    (r"^text_model\.encoder\.layers\.", "layers."),
    (r"\.mlp\.fc1\.", ".mlp_fc1."),
    (r"\.mlp\.fc2\.", ".mlp_fc2."),
    (r"^text_model\.final_layer_norm\.", "final_layer_norm."),
    (r"^text_model\.embeddings\.position_ids$", None),  # buffer: drop
]

# embedding tables keep their (vocab/positions, width) layout
CLIP_SPECIAL = [
    (r"token_embedding\.weight$", "embedding", lambda w: w),
    (r"position_embedding$", None, lambda w: w),
]
