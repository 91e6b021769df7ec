"""SAM2 memory attention + memory encoder ([external] per SURVEY.md §2c:
streaming memory bank of recent + prompted frames, object pointers).

Architecture follows the official SAM2 exactly (validated against the
transformers Sam2Video oracle in tests/test_parity.py): RoPE attention
with full-width internal projections (memory keys/values up-project
64 -> 256), pre-LN layers at torch-default eps, ConvNeXt-style memory
fuser with layer scale, and a 4x-stride-2 mask downsampler from
image-resolution masks.

TPU-first design decisions (on top of the official math):
  - The memory bank is a FIXED-SIZE ring buffer (num_maskmem spatial
    slots + max_obj_ptrs pointer slots) with per-slot validity masks —
    dynamic torch lists become static shapes so every propagation step
    reuses one compiled program (SURVEY.md §7 "hard parts" #2).
  - Invalid slots are masked out of the cross-attention softmax rather
    than gathered out (no dynamic shapes). With masking, the static
    program computes exactly the official variable-length attention.
  - Pointer tokens carry zero RoPE angles (cos=1, sin=0), equivalent to
    the official num_k_exclude_rope.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.attention import attention as flash_attention
from videovanish_tpu.ops.rope import apply_rope


class RoPEAttention(nn.Module):
    """Official Sam2 RoPE attention: q/k/v/out projections at the full
    internal width; rotary embedding on q and (optionally partially) k.

    kv_in_dim: input width of k/v (64 for memory cross-attention)."""
    embed_dim: int = 256
    num_heads: int = 1
    kv_in_dim: int = 0  # 0 -> embed_dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, rope_q=None, rope_k=None, key_valid=None):
        """q: (B, Sq, C); k/v: (B, Sk, kv_in); rope_q/rope_k: optional
        (sin, cos) tables over the respective sequences; key_valid:
        optional (B, Sk) bool mask."""
        B, Sq, C = q.shape
        inner = self.embed_dim
        hd = inner // self.num_heads
        qp = nn.Dense(inner, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(inner, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(inner, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qp), heads(kp), heads(vp)
        if rope_q is not None:
            qh = apply_rope(qh, *rope_q)
        if rope_k is not None:
            kh = apply_rope(kh, *rope_k)
        out = flash_attention(qh, kh, vh, key_mask=key_valid)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, inner)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """Official Sam2VideoMemoryAttentionLayer: pre-LN self-attention with
    RoPE, cross-attention to memory (k = memory + memory pos enc, RoPE on
    the spatial memory tokens only), ReLU MLP."""
    d_model: int = 256
    num_heads: int = 1
    kv_dim: int = 64
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem_kv, mem_pos, mem_valid,
                 rope_self=None, rope_mem=None):
        """x: (B, S, d_model); mem_kv: (B, M, kv_dim); mem_pos:
        (B, M, kv_dim); mem_valid: (B, M) bool."""
        # self-attention (positions carried by RoPE, not additive PE)
        h = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm1")(x)\
            .astype(x.dtype)
        sa = RoPEAttention(self.d_model, self.num_heads, dtype=self.dtype,
                           name="self_attn")(h, h, h, rope_q=rope_self,
                                             rope_k=rope_self)
        x = x + sa

        # cross-attention to memory: k/v up-project from kv_dim to d_model
        h = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm2")(x)\
            .astype(x.dtype)
        ca = RoPEAttention(self.d_model, self.num_heads,
                           kv_in_dim=self.kv_dim, dtype=self.dtype,
                           name="cross_attn_image")(
            h, (mem_kv + mem_pos.astype(mem_kv.dtype)), mem_kv,
            rope_q=rope_self, rope_k=rope_mem, key_valid=mem_valid)
        x = x + ca

        # MLP
        h = nn.LayerNorm(1e-5, dtype=jnp.float32, name="norm3")(x)\
            .astype(x.dtype)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="linear1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        return x + h


class MemoryAttention(nn.Module):
    num_layers: int = 4
    d_model: int = 256
    kv_dim: int = 64
    mlp_dim: int = 2048
    use_rope: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_pos, mem_kv, mem_pos, mem_valid):
        """x: (B, S, d_model) stride-16 tokens of the current frame;
        x_pos: (1|B, S, d_model) sine PE (added once, scaled by 0.1, per
        the official pos_enc_at_input); mem_kv/mem_pos: (B, M, kv_dim)
        memory tokens (spatial slots then pointer tokens); mem_valid:
        (B, M) bool."""
        rope_self = rope_mem = None
        if self.use_rope:
            import numpy as np

            from videovanish_tpu.ops.rope import axial_rope_tables
            B, S, C = x.shape
            side = int(round(S ** 0.5))
            M = mem_kv.shape[1]
            hd_self = C // 1  # official: 1 head, rope dim = head dim
            if side * side == S and (hd_self % 4 == 0):
                sin_s, cos_s = axial_rope_tables(side, side, hd_self)
                rope_self = (jnp.asarray(sin_s), jnp.asarray(cos_s))
                # memory kv: n_rep repeats of the spatial grid, then
                # pointer tokens with zero angles (no rotation) — the
                # official repeat_freqs_k + num_k_exclude_rope
                n_rep = M // S
                rem = M - n_rep * S
                sin_m = np.concatenate(
                    [np.tile(sin_s, (n_rep, 1)),
                     np.zeros((rem, hd_self // 2), np.float32)], 0)
                cos_m = np.concatenate(
                    [np.tile(cos_s, (n_rep, 1)),
                     np.ones((rem, hd_self // 2), np.float32)], 0)
                rope_mem = (jnp.asarray(sin_m), jnp.asarray(cos_m))

        x = x + 0.1 * x_pos.astype(x.dtype)  # official pos_enc_at_input
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, 1, self.kv_dim,
                                     mlp_dim=self.mlp_dim,
                                     dtype=self.dtype,
                                     name=f"layers_{i}")(
                x, mem_kv, mem_pos, mem_valid,
                rope_self=rope_self, rope_mem=rope_mem)
        return nn.LayerNorm(1e-5, dtype=jnp.float32,
                            name="norm")(x).astype(x.dtype)


class MaskDownSamplerLayer(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv")(x)
        x = nn.LayerNorm(1e-6, dtype=jnp.float32,
                         name="layer_norm")(x).astype(self.dtype)
        return nn.gelu(x.astype(jnp.float32)).astype(self.dtype)


class MemoryFuserLayer(nn.Module):
    """ConvNeXt block: depthwise 7x7 -> LN -> pw(4x) -> GELU -> pw ->
    layer scale -> residual (official Sam2VideoMemoryFuserCXBlock)."""
    dim: int
    intermediate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="depthwise_conv")(x)
        h = nn.LayerNorm(1e-6, dtype=jnp.float32,
                         name="layer_norm")(h).astype(self.dtype)
        h = nn.Dense(self.intermediate, dtype=self.dtype,
                     name="pointwise_conv1")(h)
        h = nn.gelu(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pointwise_conv2")(h)
        scale = self.param("scale", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + h * scale.astype(h.dtype)


class MemoryEncoder(nn.Module):
    """Fuse the predicted mask with image features into compact memory.

    Official structure: the mask arrives at IMAGE resolution (already
    sigmoid-scaled/biased or binarized-scaled by the caller), is
    downsampled 16x by four stride-2 conv+LN+GELU layers with channels
    growing 4x each (1 -> 4 -> 16 -> 64 -> 256) + a final 1x1 conv, added
    to 1x1-projected stride-16 image features, fused by 2 ConvNeXt
    blocks, and projected to mem_dim."""
    d_model: int = 256
    mem_dim: int = 64
    fuser_layers: int = 2
    fuser_intermediate: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, mask_scaled):
        """pix_feat: (B, H, W, d_model) stride-16; mask_scaled:
        (B, 16H, 16W, 1) image-resolution mask values (caller applies
        sigmoid*scale+bias / binarize*scale+bias).
        Returns (B, H, W, mem_dim)."""
        m = mask_scaled.astype(self.dtype)
        ch = 1
        for i in range(4):
            ch *= 4
            m = MaskDownSamplerLayer(
                ch, dtype=self.dtype,
                name=f"mask_downsampler_layers_{i}")(m)
        m = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                    name="mask_downsampler_final_conv")(m)

        x = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                    name="feature_projection")(pix_feat)
        x = x + m
        for i in range(self.fuser_layers):
            x = MemoryFuserLayer(self.d_model, self.fuser_intermediate,
                                 dtype=self.dtype,
                                 name=f"memory_fuser_layers_{i}")(x)
        return nn.Conv(self.mem_dim, (1, 1), dtype=self.dtype,
                       name="projection")(x)
