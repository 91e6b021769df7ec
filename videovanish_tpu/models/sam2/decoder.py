"""SAM2 mask decoder: two-way transformer + hypernetwork mask heads
([external] per SURVEY.md §2c; produces the mask logits the reference
thresholds at 0, sam2_masker.py:145).

Tokens: [obj_score, iou, mask_0..3] + sparse prompt embeddings. Two-way
transformer alternates token-self-attn, token->image cross-attn, MLP,
image->token cross-attn. Output upscaling uses transposed convs with
high-res skip features from strides 4/8 (SAM2 addition over SAM1).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.attention import attention as flash_attention


class DecoderAttention(nn.Module):
    """Attention with optional internal downprojection (SAM style)."""
    embed_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask=None):
        inner = self.embed_dim // self.downsample_rate
        hd = inner // self.num_heads
        B = q.shape[0]
        qp = nn.Dense(inner, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        out = flash_attention(heads(qp), heads(kp), heads(vp),
                              key_mask=key_mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, inner)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_dim: int
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, token_valid=None):
        # token self-attention (padded prompt slots masked out as keys so
        # static MAX_POINTS shapes reproduce the official variable-length
        # token math exactly)
        if self.skip_first_layer_pe:
            queries = DecoderAttention(self.embed_dim, self.num_heads,
                                       dtype=self.dtype, name="self_attn")(
                queries, queries, queries, key_mask=token_valid)
        else:
            q = queries + query_pe
            attn = DecoderAttention(self.embed_dim, self.num_heads,
                                    dtype=self.dtype, name="self_attn")(
                q, q, queries, key_mask=token_valid)
            queries = queries + attn
        queries = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm1")(queries)\
            .astype(self.dtype)

        # token -> image
        q = queries + query_pe
        k = keys + key_pe
        attn = DecoderAttention(self.embed_dim, self.num_heads, 2,
                                dtype=self.dtype,
                                name="cross_attn_token_to_image")(q, k, keys)
        queries = queries + attn
        queries = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm2")(queries)\
            .astype(self.dtype)

        # token MLP
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_lin2")(h)
        queries = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm3")(
            queries + h).astype(self.dtype)

        # image -> token
        q = queries + query_pe
        attn = DecoderAttention(self.embed_dim, self.num_heads, 2,
                                dtype=self.dtype,
                                name="cross_attn_image_to_token")(
            k, q, queries, key_mask=token_valid)
        keys = keys + attn
        keys = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm4")(keys)\
            .astype(self.dtype)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embed, image_pe, point_embed, token_valid=None):
        """image_embed: (B, HW, C); image_pe: (B, HW, C);
        point_embed: (B, P, C); token_valid: optional (B, P) bool mask of
        real (non-padding) tokens. Returns (tokens, image)."""
        queries, keys = point_embed, image_embed
        for i in range(self.depth):
            queries, keys = TwoWayBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}")(queries, keys, point_embed, image_pe,
                                    token_valid)
        # final token->image attention
        q = queries + point_embed
        k = keys + image_pe
        attn = DecoderAttention(self.embed_dim, self.num_heads, 2,
                                dtype=self.dtype,
                                name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm_final_attn")(
            queries + attn).astype(self.dtype)
        return queries, keys


class MLP(nn.Module):
    hidden: int
    out: int
    depth: int = 3
    sigmoid_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f"layers_{i}")(x))
        x = nn.Dense(self.out, dtype=self.dtype,
                     name=f"layers_{self.depth - 1}")(x)
        return nn.sigmoid(x) if self.sigmoid_out else x


class MaskDecoder(nn.Module):
    """Predict masks + IoU + object score + object pointer."""
    embed_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt,
                 high_res_s4=None, high_res_s8=None, sparse_valid=None):
        """image_embed: (B, H, W, C) stride-16 features (memory-conditioned)
        sparse_prompt: (B, P, C); sparse_valid: optional (B, P) bool
        high_res_s4/s8: optional (B, 4H, 4W, C/8) / (B, 2H, 2W, C/4) skips
        Returns dict: masks (B, M, 4H*?, ...) logits at stride 4,
        iou (B, M), obj_ptr (B, C), obj_score (B, 1).
        """
        B, H, W, C = image_embed.shape
        n_masks = self.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, C))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_masks, C))
        obj_token = self.param("obj_score_token",
                               nn.initializers.normal(1.0), (1, C))

        tokens = jnp.concatenate([obj_token, iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(tokens[None], (B,) + tokens.shape)\
            .astype(self.dtype)
        tokens = jnp.concatenate([tokens, sparse_prompt.astype(self.dtype)],
                                 axis=1)

        src = image_embed.reshape(B, H * W, C)
        pe = jnp.broadcast_to(image_pe, image_embed.shape)\
            .reshape(B, H * W, C).astype(self.dtype)

        token_valid = None
        if sparse_valid is not None:
            out_valid = jnp.ones((B, 2 + n_masks), bool)
            token_valid = jnp.concatenate([out_valid, sparse_valid], axis=1)
        hs, src = TwoWayTransformer(
            embed_dim=C, mlp_dim=8 * C, dtype=self.dtype,
            name="transformer")(src, pe, tokens, token_valid)
        obj_out = hs[:, 0]
        iou_out = hs[:, 1]
        mask_out = hs[:, 2:2 + n_masks]  # (B, M, C)

        # upscale image features stride16 -> stride4 with high-res skips
        src = src.reshape(B, H, W, C)
        up1 = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="output_upscaling_0")(src)
        if high_res_s8 is not None:
            up1 = up1 + nn.Dense(C // 4, dtype=self.dtype,
                                 name="conv_s8")(high_res_s8.astype(up1.dtype))
        up1 = nn.LayerNorm(dtype=jnp.float32,
                           name="output_upscaling_ln")(up1).astype(self.dtype)
        up1 = nn.gelu(up1.astype(jnp.float32)).astype(self.dtype)
        up2 = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="output_upscaling_1")(up1)
        if high_res_s4 is not None:
            up2 = up2 + nn.Dense(C // 8, dtype=self.dtype,
                                 name="conv_s4")(high_res_s4.astype(up2.dtype))
        up2 = nn.gelu(up2.astype(jnp.float32)).astype(self.dtype)  # (B,4H,4W,C/8)

        hyper = jnp.stack([
            MLP(C, C // 8, dtype=self.dtype,
                name=f"output_hypernetworks_mlps_{i}")(mask_out[:, i])
            for i in range(n_masks)
        ], axis=1)  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper.astype(jnp.float32),
                           up2.astype(jnp.float32))

        # official sam2 iou head ends in a sigmoid
        iou_pred = MLP(C, n_masks, self.iou_head_depth, sigmoid_out=True,
                       dtype=self.dtype,
                       name="iou_prediction_head")(iou_out)
        obj_score = MLP(C, 1, 3, dtype=self.dtype,
                        name="pred_obj_score_head")(obj_out)
        # project EVERY mask token to a pointer; the caller selects the
        # token matching its multimask choice (the official
        # object_pointer_proj of the selected sam token — projection and
        # selection commute since the MLP is per-token)
        obj_ptrs = MLP(C, C, 3, dtype=self.dtype,
                       name="obj_ptr_proj")(mask_out)

        return {
            "masks": masks,                      # (B, M, 4H, 4W) logits
            "iou": iou_pred.astype(jnp.float32),  # (B, M)
            "obj_ptr": obj_ptrs[:, 0],           # (B, C) token-0 pointer
            "obj_ptrs": obj_ptrs,                # (B, M, C) all tokens
            "obj_score": obj_score.astype(jnp.float32),  # (B, 1)
        }
