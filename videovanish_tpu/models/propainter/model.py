"""Propainter: flow-guided video inpainting prior.

Call surface mirrors the reference (ctor diffuerase.py:49, forward
:52-57): Propainter(repo_id, device); .forward(frames, masks,
ref_stride=10, neighbor_length=10, subvideo_length=50, mask_dilation=0,
progress) -> prior frames consumed by DiffuEraser.

TPU-native structure (internals [external] per SURVEY.md §2c):
  RAFT-lite flow (batched over all consecutive pairs, both directions,
  one MXU-dense program) -> flow completion in the holes -> image-domain
  bidirectional scan propagation -> feature-domain propagation + sparse
  spatiotemporal transformer (neighbor window + strided global refs) ->
  decode + composite. Sub-video chunking (subvideo_length) bounds memory
  exactly like the reference's deps; chunks are padded to a fixed length
  so every chunk reuses one compiled program.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videovanish_tpu.config import ProPainterConfig
from videovanish_tpu.core.checkpoint import maybe_load
from videovanish_tpu.core.prog import null_prog
from videovanish_tpu.models.propainter.flow_completion import FlowCompletion
from videovanish_tpu.models.propainter.propagation import (
    bidirectional_propagation,
)
from videovanish_tpu.models.propainter.raft import RAFT
from videovanish_tpu.models.propainter.transformer import SparseTransformer
from videovanish_tpu.ops.morphology import binary_dilation
from videovanish_tpu.ops.resize import (
    plan_long_side, resize_bilinear, resize_nearest_2d,
)


class FeatEncoder(nn.Module):
    ch: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.ch // 2, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="conv1")(x))
        h = nn.relu(nn.Conv(self.ch, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="conv2")(h))
        return nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv3")(h)


class FeatDecoder(nn.Module):
    ch: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        h = nn.relu(nn.Conv(self.ch // 2, (3, 3), padding=1,
                            dtype=self.dtype, name="conv1")(h))
        h = jax.image.resize(h, (B, H * 4, W * 4, self.ch // 2),
                             method="nearest")
        h = nn.relu(nn.Conv(self.ch // 4, (3, 3), padding=1,
                            dtype=self.dtype, name="conv2")(h))
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Propainter:
    def __init__(self, repo_id=None, device=None,
                 config: Optional[ProPainterConfig] = None, params=None,
                 seed: int = 0, compute_dtype=jnp.bfloat16):
        # repo_id/device accepted for reference ctor parity
        self.cfg = config or ProPainterConfig()
        self.dtype = compute_dtype if jax.default_backend() == "tpu" \
            else jnp.float32
        cfg = self.cfg
        # exact published RAFT (raft-things weight-compatible); volumes
        # are quadratic in tokens, bounded by cfg.max_img_size=432
        self.raft = RAFT(iters=cfg.raft_iters, dtype=self.dtype)
        self.flow_comp = FlowCompletion(ch=max(32, cfg.channels // 2),
                                        dtype=self.dtype)
        self.encoder = FeatEncoder(cfg.channels, dtype=self.dtype)
        self.transformer = SparseTransformer(cfg.channels, depth=4,
                                             dtype=self.dtype)
        self.decoder = FeatDecoder(cfg.channels, dtype=self.dtype)
        self.params = params if params is not None else self._init_params(seed)
        self._jit = {}

    # ------------------------------------------------------------------
    def _init_params(self, seed: int):
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 5)
        big = self.cfg.channels > 64
        h, w = 64, 64

        def init(fn, *a):
            if big:
                from videovanish_tpu.core.precision import zeros_like_shapes
                return zeros_like_shapes(jax.eval_shape(fn, *a)["params"])
            return fn(*a)["params"]

        img = jnp.zeros((2, h, w, 3), self.dtype)
        params = {
            "raft": init(self.raft.init, ks[0], img, img),
            "flow_comp": init(self.flow_comp.init, ks[1],
                              jnp.zeros((2, h, w, 2)),
                              jnp.zeros((2, h, w, 1))),
            "encoder": init(self.encoder.init, ks[2],
                            jnp.zeros((2, h, w, 5), self.dtype)),
            "transformer": init(self.transformer.init, ks[3],
                                jnp.zeros((2, h // 4, w // 4,
                                           self.cfg.channels), self.dtype)),
            "decoder": init(self.decoder.init, ks[4],
                            jnp.zeros((2, h // 4, w // 4, self.cfg.channels),
                                      self.dtype)),
        }
        loaded = maybe_load(self.cfg.checkpoint, like=params)
        return loaded if loaded is not None else params

    # ------------------------------------------------------------------
    def _chunk_fn(self, T: int, h: int, w: int,
                  neighbor_length: int, ref_stride: int):
        key = (T, h, w, neighbor_length, ref_stride)
        if key in self._jit:
            return self._jit[key]

        raft, flow_comp = self.raft, self.flow_comp
        encoder, transformer, decoder = (self.encoder, self.transformer,
                                         self.decoder)

        @jax.jit
        def run_chunk(params, frames_u8, mask_bits):
            """frames_u8: (T, h, w, 3) uint8; mask_bits: (T, h, w//8)
            bit-packed mask. uint8 + packed bits over the serial host
            link (~15-50 MB/s) instead of f32: 4x + 32x fewer bytes —
            f32 staging alone used to cost more than all of ProPainter's
            device compute at 480p."""
            frames01 = frames_u8.astype(jnp.float32) / 255.0
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (mask_bits[..., None] >> shifts) & jnp.uint8(1)
            masks1 = bits.reshape(frames01.shape[0], frames01.shape[1],
                                  w).astype(jnp.float32)[..., None]
            imgs = (frames01 * 2.0 - 1.0).astype(self.dtype)

            # 1. flows for all consecutive pairs, both directions, one batch
            pair_a = jnp.concatenate([imgs[1:], imgs[:-1]], axis=0)
            pair_b = jnp.concatenate([imgs[:-1], imgs[1:]], axis=0)
            flows = raft.apply({"params": params["raft"]}, pair_a, pair_b)
            flow_to_prev = flows[:T - 1]   # frame t -> t-1 (t = 1..T-1)
            flow_to_next = flows[T - 1:]   # frame t -> t+1 (t = 0..T-2)

            # 2. complete flows inside the holes
            cf_prev = flow_comp.apply({"params": params["flow_comp"]},
                                      flow_to_prev, masks1[1:])
            cf_next = flow_comp.apply({"params": params["flow_comp"]},
                                      flow_to_next, masks1[:-1])

            # 3. image-domain bidirectional propagation
            prop_img, remaining = bidirectional_propagation(
                frames01, masks1, cf_prev, cf_next)

            # 4. feature-domain: encode, propagate at 1/4, transform, decode
            enc_in = jnp.concatenate(
                [(prop_img * 2.0 - 1.0), masks1, remaining],
                axis=-1).astype(self.dtype)
            feat = encoder.apply({"params": params["encoder"]}, enc_in)
            h4, w4 = feat.shape[1], feat.shape[2]
            m4 = resize_nearest_2d(masks1[..., 0], h4, w4)[..., None]
            r4 = resize_nearest_2d(remaining[..., 0], h4, w4)[..., None]
            fl_prev4 = resize_bilinear(cf_prev, h4, w4) / 4.0
            fl_next4 = resize_bilinear(cf_next, h4, w4) / 4.0
            feat, _ = bidirectional_propagation(
                feat.astype(jnp.float32), r4.astype(jnp.float32),
                fl_prev4, fl_next4)
            feat = transformer.apply({"params": params["transformer"]},
                                     feat.astype(self.dtype))
            dec = decoder.apply({"params": params["decoder"]}, feat)
            dec01 = (dec.astype(jnp.float32) + 1.0) / 2.0

            pred = prop_img * (1.0 - remaining) + dec01 * remaining
            out = frames01 * (1.0 - masks1) + pred * masks1
            out = jnp.clip(out, 0.0, 1.0)
            return jnp.clip(jnp.rint(out * 255.0), 0, 255).astype(jnp.uint8)

        self._jit[key] = run_chunk
        return run_chunk

    # ------------------------------------------------------------------
    def forward(self, frames, masks, ref_stride: int = 10,
                neighbor_length: int = 10, subvideo_length: int = 50,
                mask_dilation: int = 0, progress=None,
                return_device: bool = False):
        """frames: list of (H,W,3) RGB uint8; masks: list of (H,W) or
        (H,W,3) uint8, nonzero = hole. Returns list of (H,W,3) uint8.

        return_device=True instead returns a DEVICE uint8 array
        (T, h, w, 3) at the internal processing resolution, with the
        chunk blending done on device — the prior hands off to
        DiffuEraser without the ~2x full-resolution round trip over the
        serial host link (and with one resample instead of two)."""
        prog = progress or null_prog
        frames = np.stack([np.asarray(f) for f in frames])
        T, H0, W0 = frames.shape[:3]
        masks_np = np.stack([np.asarray(m) for m in masks])
        if masks_np.ndim == 4:
            masks_np = np.any(masks_np > 0, axis=-1)
        if mask_dilation > 0:
            # rare path (both the reference and our pipeline pass 0,
            # diffuerase.py:56): full-res dilation before the resize
            m_bool = np.asarray(binary_dilation(
                jnp.asarray(masks_np > 0), mask_dilation))
        else:
            m_bool = masks_np > 0

        # All staging is host-side + uint8: resize to the internal
        # processing resolution on host, ship uint8 frames + bit-packed
        # masks, fetch uint8 (the host link is serial and slow; f32
        # full-res staging used to dominate this model's wall clock).
        h, w = plan_long_side(H0, W0, self.cfg.max_img_size, 8)
        if (H0, W0) != (h, w):
            from videovanish_tpu.ops.resize import (
                host_resize_bilinear_u8, host_resize_nearest_2d,
            )
            fr = host_resize_bilinear_u8(frames, h, w)
            mk = host_resize_nearest_2d(
                m_bool.astype(np.uint8), h, w) > 0
        else:
            fr, mk = frames, m_bool

        if T < 2:
            # degenerate single-frame case: nothing to propagate from;
            # seed the hole with the unmasked mean color (stable prior).
            # Works on the FULL-resolution frames/mask (no resize needed
            # for a mean fill).
            known = ~m_bool[..., None]
            f32 = frames.astype(np.float32)
            ksum = np.maximum(known.sum(axis=(1, 2), keepdims=True), 1.0)
            mean = (f32 * known).sum(axis=(1, 2), keepdims=True) / ksum
            out1 = np.clip(np.rint(np.where(known, f32, mean)), 0, 255) \
                .astype(np.uint8)
            if return_device:
                if (H0, W0) != (h, w):
                    from videovanish_tpu.ops.resize import (
                        host_resize_bilinear_u8,
                    )
                    out1 = host_resize_bilinear_u8(out1, h, w)
                return jnp.asarray(out1)
            return [out1[i] for i in range(T)]

        mk_bits = np.packbits(mk, axis=-1)
        sub = max(2, min(subvideo_length, T))
        overlap = min(4, sub // 2) if T > sub else 0
        run = self._chunk_fn(sub, h, w, neighbor_length, ref_stride)

        # chunk blending accumulators: on device for the handoff path
        # (nothing crosses the link), host numpy otherwise
        if return_device:
            out = jnp.zeros((T, h, w, 3), jnp.float32)
            wsum = jnp.zeros((T, 1, 1, 1), jnp.float32)
        else:
            out = np.zeros((T, h, w, 3), np.float32)
            wsum = np.zeros((T, 1, 1, 1), np.float32)
        start = 0
        n_chunks = max(1, -(-(T - overlap) // (sub - overlap))) if T > sub else 1
        ci = 0
        while start < T:
            end = min(start + sub, T)
            s = max(0, end - sub)  # pad window back to full sub length
            prog(20 + 28 * ci / n_chunks, f"propainter chunk {ci + 1}")
            chunk = run(self.params, jnp.asarray(fr[s:s + sub]),
                        jnp.asarray(mk_bits[s:s + sub]))
            if return_device:
                out = out.at[s:s + sub].add(chunk.astype(jnp.float32))
                wsum = wsum.at[s:s + sub].add(1.0)
            else:
                chunk = np.asarray(chunk).astype(np.float32)
                out[s:s + sub] += chunk
                wsum[s:s + sub] += 1.0
            ci += 1
            if end >= T:
                break
            start = end - overlap

        if return_device:
            return jnp.clip(jnp.rint(out / wsum), 0, 255).astype(jnp.uint8)

        out = np.clip(np.rint(out / wsum), 0, 255).astype(np.uint8)
        if (H0, W0) != (h, w):
            from videovanish_tpu.ops.resize import host_resize_bilinear_u8
            out = host_resize_bilinear_u8(out, H0, W0)
        return [out[i] for i in range(T)]

    __call__ = forward
