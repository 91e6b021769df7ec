"""SAM2 memory attention + memory encoder ([external] per SURVEY.md §2c:
streaming memory bank of recent + prompted frames, object pointers).

TPU-first design decisions:
  - The memory bank is a FIXED-SIZE ring buffer (num_maskmem spatial
    slots + max_obj_ptrs pointer slots) with per-slot validity masks —
    dynamic torch lists become static shapes so every propagation step
    reuses one compiled program (SURVEY.md §7 "hard parts" #2).
  - Invalid slots are masked by a large negative attention bias rather
    than gathered out (no dynamic shapes).
  - Cross-attention memory keys/values stay in the compact mem_dim (64)
    with per-slot temporal position embeddings.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.attention import attention as flash_attention


def masked_attention(q, k, v, key_valid, scale=None):
    """Attention where invalid keys are masked out.

    q: (B, H, Sq, D); k/v: (B, H, Sk, D); key_valid: (B, Sk) bool.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    bias = jnp.where(key_valid[:, None, None, :], 0.0, -1e30)
    p = jax.nn.softmax(s + bias, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


class MemoryAttentionLayer(nn.Module):
    d_model: int = 256
    num_heads: int = 1
    kv_dim: int = 64
    mlp_dim: int = 2048
    use_rope: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_pos, mem_kv, mem_pos, mem_valid,
                 rope_self=None, rope_cross=None, rope_mem=None):
        """x: (B, S, d_model); mem_kv: (B, M, kv_dim); mem_pos: (B, M, kv_dim);
        mem_valid: (B, M) bool. rope_*: optional (sin, cos) tables —
        axial RoPE over the spatial grid (official SAM2.1 attention
        geometry); memory pointer tokens carry no RoPE (rope_mem covers
        only the spatial slots, zero angles elsewhere)."""
        from videovanish_tpu.ops.rope import apply_rope
        B, S, C = x.shape
        hd = C // self.num_heads

        def heads(t, d):
            return t.reshape(B, -1, self.num_heads, d).transpose(0, 2, 1, 3)

        # self-attention (with image positional encoding)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(x.dtype)
        qk = h + x_pos.astype(h.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="self_q")(qk)
        k = nn.Dense(C, dtype=self.dtype, name="self_k")(qk)
        v = nn.Dense(C, dtype=self.dtype, name="self_v")(h)
        q, k = heads(q, hd), heads(k, hd)
        if rope_self is not None:
            q = apply_rope(q, *rope_self)
            k = apply_rope(k, *rope_self)
        sa = flash_attention(q, k, heads(v, hd))
        sa = sa.transpose(0, 2, 1, 3).reshape(B, S, C)
        x = x + nn.Dense(C, dtype=self.dtype, name="self_out")(sa)

        # cross-attention to memory (compact kv_dim head space)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
        khd = self.kv_dim // self.num_heads
        q = nn.Dense(self.kv_dim, dtype=self.dtype, name="cross_q")(
            h + x_pos.astype(h.dtype))
        k = nn.Dense(self.kv_dim, dtype=self.dtype, name="cross_k")(
            mem_kv + mem_pos.astype(mem_kv.dtype))
        v = nn.Dense(self.kv_dim, dtype=self.dtype, name="cross_v")(mem_kv)
        q, k = heads(q, khd), heads(k, khd)
        if rope_cross is not None:
            q = apply_rope(q, *rope_cross)
        if rope_mem is not None:
            k = apply_rope(k, *rope_mem)
        ca = masked_attention(q, k, heads(v, khd), mem_valid)
        ca = ca.transpose(0, 2, 1, 3).reshape(B, S, self.kv_dim)
        x = x + nn.Dense(C, dtype=self.dtype, name="cross_out")(ca)

        # MLP
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x).astype(x.dtype)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class MemoryAttention(nn.Module):
    num_layers: int = 4
    d_model: int = 256
    kv_dim: int = 64
    use_rope: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_pos, mem_kv, mem_pos, mem_valid):
        rope_self = rope_cross = rope_mem = None
        if self.use_rope:
            import numpy as np

            from videovanish_tpu.ops.rope import axial_rope_tables
            B, S, C = x.shape
            side = int(round(S ** 0.5))
            M = mem_kv.shape[1]
            if side * side == S and (C % 4 == 0) and (self.kv_dim % 4 == 0):
                sin_s, cos_s = axial_rope_tables(side, side, C)
                rope_self = (jnp.asarray(sin_s), jnp.asarray(cos_s))
                sin_c, cos_c = axial_rope_tables(side, side, self.kv_dim)
                rope_cross = (jnp.asarray(sin_c), jnp.asarray(cos_c))
                # memory kv: n_slots repeats of the spatial grid, then
                # pointer tokens with zero angles (no rotation)
                n_rep = M // S  # full spatial slots
                rem = M - n_rep * S
                sin_m = np.concatenate(
                    [np.tile(sin_c, (n_rep, 1)),
                     np.zeros((rem, self.kv_dim // 2), np.float32)], 0)
                cos_m = np.concatenate(
                    [np.tile(cos_c, (n_rep, 1)),
                     np.ones((rem, self.kv_dim // 2), np.float32)], 0)
                rope_mem = (jnp.asarray(sin_m), jnp.asarray(cos_m))
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, 1, self.kv_dim,
                                     use_rope=self.use_rope,
                                     dtype=self.dtype,
                                     name=f"layers_{i}")(
                x, x_pos, mem_kv, mem_pos, mem_valid,
                rope_self=rope_self, rope_cross=rope_cross,
                rope_mem=rope_mem)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(x.dtype)


class MemoryEncoder(nn.Module):
    """Fuse predicted mask with image features into compact memory features.

    mask (stride-4 logits) is downsampled by strided convs to stride 16,
    added to projected image features, fused, projected to mem_dim.
    """
    d_model: int = 256
    mem_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, mask_logits):
        """pix_feat: (B, H, W, d_model) stride-16; mask_logits: (B, 4H, 4W, 1).
        Returns (B, H, W, mem_dim)."""
        m = jax.nn.sigmoid(mask_logits.astype(jnp.float32)).astype(self.dtype)
        # mask downsampler: two stride-2 convs with LN+GELU
        ch = self.d_model // 4
        for i in range(2):
            m = nn.Conv(ch * (i + 1), (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"mask_downsampler_{i}")(m)
            m = nn.LayerNorm(dtype=jnp.float32,
                             name=f"mask_downsampler_ln_{i}")(m).astype(self.dtype)
            m = nn.gelu(m.astype(jnp.float32)).astype(self.dtype)
        m = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                    name="mask_downsampler_out")(m)

        x = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                    name="pix_feat_proj")(pix_feat)
        x = x + m
        # fuser: 2 depthwise-ish conv blocks (CX-style)
        for i in range(2):
            h = nn.Conv(self.d_model, (7, 7), padding=3,
                        feature_group_count=self.d_model, dtype=self.dtype,
                        name=f"fuser_{i}_dwconv")(x)
            h = nn.LayerNorm(dtype=jnp.float32,
                             name=f"fuser_{i}_norm")(h).astype(self.dtype)
            h = nn.Dense(4 * self.d_model, dtype=self.dtype,
                         name=f"fuser_{i}_pw1")(h)
            h = nn.gelu(h.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(self.d_model, dtype=self.dtype,
                         name=f"fuser_{i}_pw2")(h)
            x = x + h
        return nn.Conv(self.mem_dim, (1, 1), dtype=self.dtype,
                       name="out_proj")(x)
