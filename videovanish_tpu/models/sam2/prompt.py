"""Prompt encoder: points / boxes -> sparse embeddings ([external] per
SURVEY.md §2c; call surface add_new_points_or_box, sam2_masker.py:121-138).

Shape-static design: every prompt batch is padded to MAX_POINTS with a
"not a point" label (-1), so one jitted program serves any click count.
Labels: 1 positive, 0 negative, 2/3 box corners, -1 padding.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

MAX_POINTS = 16  # static prompt capacity per (frame, object)


class PositionEmbeddingRandom(nn.Module):
    """Random spatial-frequency Fourier features for [0,1]^2 coords."""
    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords01):
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jnp.asarray(
                np.random.default_rng(0).standard_normal(shape), jnp.float32),
            (2, self.num_pos_feats))
        c = 2.0 * coords01 - 1.0
        c = c @ gauss
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    """Points/boxes to (B, MAX_POINTS+1, embed_dim) sparse embeddings plus
    a learned dense no-mask embedding."""
    embed_dim: int = 256
    image_size: int = 1024

    @nn.compact
    def __call__(self, points_px, labels):
        """points_px: (B, MAX_POINTS, 2) in pixels; labels: (B, MAX_POINTS)
        int32 in {-1, 0, 1, 2, 3}. Returns (sparse (B, P, D), dense_nomask (D,))."""
        pe = PositionEmbeddingRandom(self.embed_dim // 2, name="pe_layer")
        # learned per-label embeddings: [neg, pos, box1, box2]
        point_embeds = self.param("point_embeddings",
                                  nn.initializers.normal(1.0),
                                  (4, self.embed_dim))
        not_a_point = self.param("not_a_point_embed",
                                 nn.initializers.normal(1.0),
                                 (self.embed_dim,))
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (self.embed_dim,))

        coords01 = (points_px + 0.5) / self.image_size
        emb = pe(coords01)  # (B, P, D)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, not_a_point[None, None], emb)
        for li in range(4):
            emb = jnp.where(lab == li, emb + point_embeds[li][None, None], emb)
        return emb, no_mask
