"""Prompt encoder: points / boxes -> sparse embeddings ([external] per
SURVEY.md §2c; call surface add_new_points_or_box, sam2_masker.py:121-138).

Shape-static design: every prompt batch is padded to MAX_POINTS with a
"not a point" label (-1), so one jitted program serves any click count;
the mask decoder masks padded slots out of its attention so results
equal the official variable-length math exactly (decoder.py).
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

    def setup(self):
        self.gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jnp.asarray(
                np.random.default_rng(0).standard_normal(shape), jnp.float32),
            (2, self.num_pos_feats))

    def __call__(self, coords01):
        c = 2.0 * coords01 - 1.0
        c = c @ self.gauss
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    """Points/boxes to (B, MAX_POINTS, embed_dim) sparse embeddings plus
    a learned dense no-mask embedding. dense_pe() gives the image-grid
    positional encoding the mask decoder consumes (the official
    get_dense_pe(): random-Fourier features over pixel centers)."""
    embed_dim: int = 256
    image_size: int = 1024

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2,
                                                name="pe_layer")
        # learned per-label embeddings: [neg, pos, box1, box2]
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (self.embed_dim,))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,))

    def __call__(self, points_px, labels):
        """points_px: (B, MAX_POINTS, 2) (x, y) pixels; labels:
        (B, MAX_POINTS) int32 in {-1, 0, 1, 2, 3}.
        Returns (sparse (B, P, D), dense_nomask (D,))."""
        coords01 = (points_px + 0.5) / self.image_size
        emb = self.pe_layer(coords01)  # (B, P, D)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed[None, None], emb)
        for li in range(4):
            emb = jnp.where(lab == li,
                            emb + self.point_embeddings[li][None, None], emb)
        return emb, self.no_mask_embed

    def dense_pe(self, h: int, w: int):
        """(h, w, D) positional encoding over the image-embedding grid
        (official PositionEmbeddingRandom.forward: pixel-center coords
        normalized per axis, (x, y) order)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (h, w)),
             jnp.broadcast_to(ys[:, None], (h, w))], axis=-1)
        return self.pe_layer(coords)
