"""Flow completion: fill optical flow inside masked regions ([external]
per SURVEY.md §2c — ProPainter's recurrent flow-completion stage).

A compact encoder-decoder over (flow, mask) that predicts flow residuals
in the hole; outside the hole the estimated flow passes through. Runs
batched over all frame pairs at once (frames ride the batch axis — the
TPU-friendly alternative to the reference's per-pair recurrent loop).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FlowCompletion(nn.Module):
    ch: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, mask):
        """flow: (B, H, W, 2) f32; mask: (B, H, W, 1) in {0,1} (1 = hole).
        Returns completed flow (B, H, W, 2)."""
        c = self.ch
        # normalize flow scale for the network; re-scale at the output
        scale = jnp.asarray([flow.shape[2], flow.shape[1]], jnp.float32) / 20.0
        x = jnp.concatenate(
            [(flow / scale).astype(self.dtype),
             mask.astype(self.dtype)], axis=-1)

        def conv(ch, k, s, name):
            return nn.Conv(ch, (k, k), strides=(s, s), padding=k // 2,
                           dtype=self.dtype, name=name)

        e1 = nn.relu(conv(c, 3, 1, "enc1")(x))
        e2 = nn.relu(conv(c * 2, 3, 2, "enc2")(e1))
        e3 = nn.relu(conv(c * 4, 3, 2, "enc3")(e2))
        m = nn.relu(conv(c * 4, 3, 1, "mid1")(e3))
        m = nn.relu(conv(c * 4, 3, 1, "mid2")(m)) + e3

        B, H2, W2, _ = e2.shape
        d2 = jax.image.resize(m, (B, H2, W2, m.shape[-1]), method="nearest")
        d2 = nn.relu(conv(c * 2, 3, 1, "dec2")(d2)) + e2
        B, H1, W1, _ = e1.shape
        d1 = jax.image.resize(d2, (B, H1, W1, d2.shape[-1]), method="nearest")
        d1 = nn.relu(conv(c, 3, 1, "dec1")(d1)) + e1
        res = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                      name="out")(d1).astype(jnp.float32) * scale

        m1 = mask.astype(jnp.float32)
        return flow * (1.0 - m1) + res * m1
