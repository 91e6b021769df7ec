"""DiffuEraser: the end-to-end diffusion video-inpainting model.

Call surface mirrors the reference class (ctor diffuerase.py:39-45,
forward :60-67): frames + masks + prior frames in, inpainted frames out,
with max_img_size capping the inference resolution (long side, /8).

TPU-native design (vs the reference's per-clip torch loop):
  - one jit-compiled denoise step per (clip_len, h, w) signature:
    BrushNet features + UNet epsilon + PCM transition fused into a
    single XLA program; VAE encode/decode batched over frames;
  - overlapping temporal windows with f32 latent accumulation and a
    fixed reduction order -> deterministic, seam-free blending (each
    frame is decoded exactly once);
  - noise is drawn once for the whole video from a seeded PRNG and
    sliced per window, so overlapping windows agree on each frame's
    noise (bitwise-stable chunk blending, BASELINE north star).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videovanish_tpu.config import DiffuEraserConfig, default_config
from videovanish_tpu.core.checkpoint import maybe_load
from videovanish_tpu.core.prog import null_prog
from videovanish_tpu.models.diffueraser.brushnet import BrushNetModel
from videovanish_tpu.models.diffueraser.scheduler import (
    NoiseSchedule, consistency_step, pcm_timesteps,
)
from videovanish_tpu.models.diffueraser.unet import UNetCondition
from videovanish_tpu.models.diffueraser.vae import AutoencoderKL
from videovanish_tpu.ops.morphology import binary_dilation
from videovanish_tpu.ops.resize import (
    host_resize_bilinear_u8, host_resize_nearest_2d, plan_long_side,
    resize_bilinear, resize_nearest_2d,
)
from videovanish_tpu.utils.observability import record_sharding, stage_timer


def _emit_stage(name: str, seconds: float, **fields):
    """Record an already-measured duration as a stage (used for phases
    whose end is only known after an explicit device sync)."""
    from videovanish_tpu.utils.observability import record_stage
    record_stage(name, seconds, **fields)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _prior_to_rgb01(pf_u8, h, w):
    """Device-resident prior (uint8, any resolution) -> rgb01 at the
    inference resolution, entirely on device."""
    x = pf_u8.astype(jnp.float32) / 255.0
    if pf_u8.shape[1:3] != (h, w):
        x = resize_bilinear(x, h, w)
    return x


def make_window_plan(n_frames: int, clip_len: int, overlap: int):
    """Static list of (start, length) windows covering [0, n_frames) with
    `overlap` shared frames between neighbors. Pure python (shape planning)."""
    if n_frames <= clip_len:
        return [(0, n_frames)]
    stride = clip_len - overlap
    starts = list(range(0, n_frames - clip_len + stride, stride))
    plan = []
    for s in starts:
        if s + clip_len >= n_frames:
            plan.append((n_frames - clip_len, clip_len))
            break
        plan.append((s, clip_len))
    return plan


def window_blend_weights(length: int, overlap: int, is_first: bool,
                         is_last: bool) -> np.ndarray:
    """Linear cross-fade ramps on the overlapped edges (f32)."""
    w = np.ones(length, dtype=np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap) + 1.0) / (overlap + 1.0)
        if not is_first:
            w[:overlap] = ramp
        if not is_last:
            w[-overlap:] = ramp[::-1]
    return w


class DiffuEraser:
    """SD1.5 + BrushNet + temporal attention + PCM few-step sampler."""

    def __init__(self, device=None, sd_repo: str = None, vae_repo: str = None,
                 diffueraser_repo: str = None, ckpt: str = "2-Step",
                 config: Optional[DiffuEraserConfig] = None,
                 params=None, seed: int = 0,
                 compute_dtype=jnp.bfloat16, init_mode: str = "auto",
                 mesh=None):
        # device/sd_repo/vae_repo/diffueraser_repo accepted for reference
        # ctor compatibility (diffuerase.py:39-45); weights come from the
        # config's orbax checkpoints here.
        self.cfg = config or default_config().diffueraser
        self.ckpt = "2-Step" if ckpt is None else ckpt
        # "N-Step" PCM checkpoints imply N inference steps (the reference
        # hardcodes "2-Step", diffuerase.py:37; we honor the parameter)
        import dataclasses
        import re
        m_steps = re.match(r"^(\d+)-Step$", str(self.ckpt))
        if m_steps and int(m_steps.group(1)) != self.cfg.num_inference_steps:
            self.cfg = dataclasses.replace(
                self.cfg, num_inference_steps=int(m_steps.group(1)))
        self.seed = seed
        self.dtype = compute_dtype if jax.default_backend() == "tpu" \
            else jnp.float32
        self.schedule = NoiseSchedule()

        cfg = self.cfg
        heads = cfg.attention_head_dim
        self.vae = AutoencoderKL(cfg.vae_block_out_channels, 2,
                                 cfg.vae_latent_channels, dtype=self.dtype)
        self.unet = UNetCondition(
            in_channels=cfg.sample_channels,
            out_channels=cfg.sample_channels,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            num_attention_heads=heads,
            cross_attention_dim=cfg.cross_attention_dim,
            dtype=self.dtype)
        self.brushnet = BrushNetModel(
            in_channels=2 * cfg.sample_channels + 1,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            num_attention_heads=heads,
            dtype=self.dtype)
        self.params = params if params is not None \
            else self._init_params(init_mode)
        if self.dtype == jnp.bfloat16:
            from videovanish_tpu.core.precision import cast_params_for_inference
            self.params = cast_params_for_inference(self.params, self.dtype)
        # optional multi-chip SPMD inference: frames shard over the "data"
        # mesh axis; pjit emits the temporal-attention collectives
        # (sequence parallelism over the clip) and replicates params
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.params = jax.device_put(
                self.params, NamedSharding(mesh, P()))
        self._jit_cache = {}

    # ------------------------------------------------------------------
    def _init_params(self, mode: str = "auto"):
        """Load orbax checkpoints if present, else initialize.

        mode "random": full flax init (traces every module — slow for the
        production-size model, fine for smoke configs). mode "zeros":
        shape-only init via eval_shape (instant; checkpoints or training
        provide real values). "auto" picks by model size.
        """
        cfg = self.cfg
        if mode == "auto":
            mode = "random" if cfg.block_out_channels[0] <= 64 else "zeros"
        key = jax.random.PRNGKey(self.seed)
        kv, ku, kb, kt = jax.random.split(key, 4)
        lat = cfg.sample_channels
        img = jnp.zeros((1, 32, 32, 3), self.dtype)
        z = jnp.zeros((2, 16, 16, lat), self.dtype)
        txt = jnp.zeros((2, 77, cfg.cross_attention_dim), self.dtype)
        bsamp = jnp.zeros((2, 16, 16, 2 * lat + 1), self.dtype)
        t = jnp.zeros((2,), jnp.int32)

        zdec = jnp.zeros((1, 4, 4, lat), self.dtype)
        if mode == "zeros":
            from videovanish_tpu.core.precision import zeros_like_shapes

            def zero_init(fn, *a):
                return zeros_like_shapes(jax.eval_shape(fn, *a)["params"])

            vae_enc = zero_init(functools.partial(
                self.vae.init, method=self.vae.encode), kv, img)
            vae_dec = zero_init(functools.partial(
                self.vae.init, method=self.vae.decode), kv, zdec)
            vae_p = {**vae_dec, **vae_enc}
            # t_frames must stay static under eval_shape -> close over it
            unet_p = zero_init(
                lambda k, a, b, c: self.unet.init(k, a, b, c, 2), ku, z, t, txt)
            brush_p = zero_init(
                lambda k, a, b, c: self.brushnet.init(k, a, b, c, 2),
                kb, bsamp, t, txt)
        else:
            vae_p = self.vae.init(kv, img, method=self.vae.encode)["params"]
            vae_p2 = self.vae.init(kv, zdec, method=self.vae.decode)["params"]
            vae_p = {**vae_p2, **vae_p}
            unet_p = self.unet.init(ku, z, t, txt, 2)["params"]
            brush_p = self.brushnet.init(kb, bsamp, t, txt, 2)["params"]
        null_emb = jax.random.normal(kt, (77, cfg.cross_attention_dim),
                                     jnp.float32) * 0.02

        params = {"vae": vae_p, "unet": unet_p, "brushnet": brush_p,
                  "null_text_emb": null_emb}

        loaded = maybe_load(cfg.checkpoint, like=params)
        if loaded is not None:
            params = loaded
        else:
            vae_loaded = maybe_load(cfg.vae_checkpoint, like=vae_p)
            if vae_loaded is not None:
                params = {**params, "vae": vae_loaded}
        return params

    # ------------------------------------------------------------------
    def _get_jitted(self, t_frames: int):
        """Build (encode, denoise_window, decode) jitted for a clip length."""
        if t_frames in self._jit_cache:
            return self._jit_cache[t_frames]

        vae, unet, brushnet = self.vae, self.unet, self.brushnet
        if self.mesh is not None:
            from videovanish_tpu.core.mesh import DATA_AXIS
            ndev = self.mesh.shape[DATA_AXIS]
            if ndev > 1 and t_frames % ndev == 0:
                # sequence parallelism: this window's frames shard over
                # "data"; temporal attention runs as ring attention over
                # ICI instead of letting XLA all-gather the clip
                unet = unet.clone(ring_mesh=self.mesh)
                brushnet = brushnet.clone(ring_mesh=self.mesh)
        schedule = self.schedule
        scale = self.cfg.vae_scaling_factor
        steps = pcm_timesteps(self.cfg.num_inference_steps,
                              schedule.num_train_timesteps)

        def encode(params, rgb01):
            """rgb01: (N, H, W, 3) f32 in [0,1] -> scaled latents."""
            x = (rgb01 * 2.0 - 1.0).astype(unet.dtype)
            return vae.apply({"params": params["vae"]}, x,
                             method=vae.encode) * scale

        def encode_masked_u8(params, x_u8, m_bits):
            """uint8 frame chunk + BIT-PACKED mask chunk -> (masked
            latents, latent-res mask). The mask ships as one bit per
            pixel (np.packbits over the row axis) because the ~25 MB/s
            host link does not overlap device compute: a full-res uint8
            mask alone costs ~20 ms/frame of wall clock at 720p. Frames
            stay uint8; normalization/masking happen on device."""
            x = x_u8.astype(jnp.float32) / 255.0
            w = x.shape[2]
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (m_bits[..., None] >> shifts) & jnp.uint8(1)
            m_u8 = bits.reshape(m_bits.shape[0], m_bits.shape[1], w)
            m_f = m_u8.astype(jnp.float32)[..., None]
            lat = encode(params, x * (1.0 - m_f))
            h8c, w8c = x.shape[1] // 8, w // 8
            m_lat = resize_nearest_2d(m_u8, h8c, w8c)
            return lat, (m_lat > 0).astype(jnp.float32)[..., None]

        def encode_u8(params, x_u8):
            return encode(params, x_u8.astype(jnp.float32) / 255.0)

        def encode_masked_yuv(params, yuv_u8, m_bits):
            """I420 frame chunk + bit-packed mask chunk -> (masked
            latents, latent-res mask). Same contract as encode_masked_u8
            but the frames arrive as 4:2:0 YUV — 2x fewer bytes over the
            serial host link (ops/colorspace.py)."""
            from videovanish_tpu.ops.colorspace import yuv420_to_rgb01
            x = yuv420_to_rgb01(yuv_u8)
            w = x.shape[2]
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (m_bits[..., None] >> shifts) & jnp.uint8(1)
            m_u8 = bits.reshape(m_bits.shape[0], m_bits.shape[1], w)
            m_f = m_u8.astype(jnp.float32)[..., None]
            lat = encode(params, x * (1.0 - m_f))
            h8c, w8c = x.shape[1] // 8, w // 8
            m_lat = resize_nearest_2d(m_u8, h8c, w8c)
            return lat, (m_lat > 0).astype(jnp.float32)[..., None]

        def encode_yuv(params, yuv_u8):
            from videovanish_tpu.ops.colorspace import yuv420_to_rgb01
            return encode(params, yuv420_to_rgb01(yuv_u8))

        def decode(params, z):
            """Latents -> RGB uint8 (uint8 on device: 4x fewer bytes over
            the host link than f32)."""
            x = vae.apply({"params": params["vae"]},
                          (z / scale).astype(unet.dtype), method=vae.decode)
            x01 = jnp.clip((x.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
            return jnp.clip(jnp.rint(x01 * 255.0), 0.0, 255.0) \
                .astype(jnp.uint8)

        def denoise_window(params, prior_lat, masked_lat, mask_lat, noise,
                           prompt_emb, guidance: float = 0.0):
            """One temporal window: PCM few-step denoise. All (T, h8, w8, C);
            prompt_emb: (77, D) conditioning (the null-prompt embedding by
            default; a CLIP-encoded prompt for prompt-guided inpainting).
            guidance: static CFG scale; 0 (the reference default,
            diffuerase.py:61 -> guidance_scale None) means no
            classifier-free guidance and a single UNet pass per step."""
            T = prior_lat.shape[0]
            txt = jnp.broadcast_to(
                prompt_emb.astype(unet.dtype)[None],
                (T, 77, prompt_emb.shape[-1]))
            use_cfg = guidance > 0.0
            if use_cfg:
                null = jnp.broadcast_to(
                    params["null_text_emb"].astype(unet.dtype)[None],
                    (T, 77, prompt_emb.shape[-1]))
            x = schedule.add_noise(prior_lat, noise,
                                   jnp.full((T,), steps[0], jnp.int32))
            reuse = self.cfg.brushnet_feature_reuse
            reuse_attn = self.cfg.spatial_attn_reuse
            feats = {}  # conditioning -> brushnet features
            attn_caches = {}  # conditioning -> recorded attention outputs
            for i, t_i in enumerate(steps):
                t_vec = jnp.full((T,), int(t_i), jnp.int32)
                if not feats or not reuse:
                    bsample = jnp.concatenate(
                        [x, masked_lat, mask_lat], axis=-1).astype(unet.dtype)
                    feats = {"c": brushnet.apply(
                        {"params": params["brushnet"]}, bsample, t_vec, txt,
                        t_frames)}
                    if use_cfg:
                        feats["u"] = brushnet.apply(
                            {"params": params["brushnet"]}, bsample, t_vec,
                            null, t_frames)

                def eps_for(cond, which):
                    bd, bm, bu = feats[which]
                    kw = dict(brushnet_down=bd, brushnet_mid=bm,
                              brushnet_up=bu)
                    if not reuse_attn:
                        return unet.apply({"params": params["unet"]},
                                          x.astype(unet.dtype), t_vec, cond,
                                          t_frames, **kw)
                    # cfg.spatial_attn_reuse: record every Transformer2D
                    # attention output at the first PCM step, replay it
                    # at later steps (blocks.Attention "attn_cache")
                    if which in attn_caches:
                        return unet.apply(
                            {"params": params["unet"],
                             "attn_cache": attn_caches[which]},
                            x.astype(unet.dtype), t_vec, cond, t_frames,
                            **kw)
                    eps_i, vars_ = unet.apply(
                        {"params": params["unet"]}, x.astype(unet.dtype),
                        t_vec, cond, t_frames, mutable=["attn_cache"],
                        **kw)
                    attn_caches[which] = vars_["attn_cache"]
                    return eps_i

                eps = eps_for(txt, "c")
                if use_cfg:
                    eps_u = eps_for(null, "u")
                    eps = eps_u + guidance * (eps - eps_u)
                t_next = int(steps[i + 1]) if i + 1 < len(steps) else -1
                x = consistency_step(schedule, x, eps.astype(jnp.float32),
                                     jnp.int32(t_i), jnp.int32(t_next))
            return x.astype(jnp.float32)

        # plain jit everywhere: under a mesh, shardings ride in on the
        # arguments (forward() device_puts window inputs frame-sharded)
        # and XLA propagates them through the whole program
        encode = jax.jit(encode)
        denoise_window = jax.jit(
            denoise_window, static_argnames=("guidance",))
        decode = jax.jit(decode)
        encode_masked_yuv = jax.jit(encode_masked_yuv)
        encode_yuv = jax.jit(encode_yuv)
        encode_masked_u8 = jax.jit(encode_masked_u8)
        encode_u8 = jax.jit(encode_u8)

        fns = (encode, encode_masked_u8, encode_u8,
               denoise_window, decode, encode_masked_yuv, encode_yuv)
        self._jit_cache[t_frames] = fns
        return fns

    # ------------------------------------------------------------------
    def forward(self, frames, masks, prior_frames=None, max_img_size: int = 960,
                mask_dilation_iter: int = 0, guidance_scale=None,
                progress=None, prompt_embeds=None, output_roi=None,
                roi_margin: int = 16, frame_offset: int = 0,
                latent_carry=None, return_latent_tail: int = 0):
        """Inpaint `frames` where `masks` is nonzero, seeded by `prior_frames`.

        frames: list/array of (H0,W0,3) RGB uint8
        masks:  list/array of (H0,W0) or (H0,W0,3) uint8, nonzero = hole
        prior_frames: low-frequency prior (ProPainter output); if None the
            masked regions are seeded from the masked-out input itself.
            A DEVICE uint8 array (T, hp, wp, 3) is also accepted
            (Propainter.forward(return_device=True)) and is resized +
            VAE-encoded entirely on device — no host round trip.
        prompt_embeds: optional (77, D) CLIP text embedding for prompt-
            guided inpainting (models/diffueraser/text_encoder.py); the
            reference behavior (empty prompt, guidance 0) is the default.
        output_roi: None (default: fetch full decoded frames), "auto"
            (the mask's bounding box + `roi_margin` px), or an explicit
            (y0, y1, x0, x1) at inference resolution. With an ROI, only
            that window of each decoded frame crosses the (serial,
            ~15-50 MB/s) host link; pixels outside it are the resized
            INPUT pixels. This is exact for the default pipeline
            (keep_unmasked_original, diffuerase.py:75-112) as long as
            roi_margin >= feather_px: the feathered alpha is identically
            0 beyond feather_px outside the dilated mask, so out-of-ROI
            model output is discarded anyway (the pipeline passes
            roi_margin = 16 + feather_px).
        frame_offset / latent_carry / return_latent_tail implement
        cross-chunk LATENT blending for the long-video driver (BASELINE
        config 4): noise is a pure function of the GLOBAL frame index
        (fold_in), so overlapped frames share noise across chunks;
        `latent_carry=(z_acc, w_acc)` seeds the blend accumulators of
        the first frames with the previous chunk's (still-ramped) tail;
        `return_latent_tail=n` withholds the last n frames from decode
        and returns their accumulators instead — the seam then blends in
        latent space exactly like an in-chunk window seam.

        Returns list of (h,w,3) RGB uint8 at inference resolution (the
        pipeline layer composites/rescales back, as the reference does at
        diffuerase.py:70-112); with return_latent_tail > 0, returns
        (frames_list_without_tail, (z_acc_tail, w_acc_tail)).
        """
        prog = progress or null_prog
        cfg = self.cfg
        frames = np.stack([np.asarray(f) for f in frames])
        T, H0, W0 = frames.shape[0], frames.shape[1], frames.shape[2]
        masks = np.stack([np.asarray(m) for m in masks])
        if masks.ndim == 4:
            masks = np.any(masks > 0, axis=-1).astype(np.uint8)
        masks = (masks > 0).astype(np.uint8)

        h, w = plan_long_side(H0, W0, min(max_img_size, cfg.max_img_size), 8)
        h8, w8 = h // 8, w // 8

        # ---- host->device staging ----
        # The axon tunnel moves ~25 MB/s, so bytes on the wire dominate the
        # 720p wall clock (measured: f32 full-res staging alone cost more
        # than all device compute). Resize to the inference resolution on
        # host (cv2-exact semantics, matching ops/resize.py) and ship
        # uint8 — 7x fewer bytes than f32 full-res; normalization happens
        # on device. Dilation (rare in-model path; the pipeline layer
        # dilates before calling us, diffuerase.py:26-31) happens at full
        # res on host to preserve reference semantics.
        if mask_dilation_iter > 0:
            masks = np.asarray(binary_dilation(jnp.asarray(masks),
                                               mask_dilation_iter))
        if (H0, W0) != (h, w):
            frames = host_resize_bilinear_u8(frames, h, w)
            masks = host_resize_nearest_2d(masks, h, w)

        pf = pf01_dev = None  # no prior: prior latents == masked latents
        if isinstance(prior_frames, jnp.ndarray):
            pf01_dev = _prior_to_rgb01(prior_frames, h, w)
        elif prior_frames is not None:
            pf = np.stack([np.asarray(f) for f in prior_frames])
            if pf.shape[1:3] != (h, w):
                pf = host_resize_bilinear_u8(pf, h, w)

        # ---- optional ROI fetch (see docstring) ----
        roi = None
        if output_roi is not None:
            if isinstance(output_roi, str) and output_roi == "auto":
                mg = int(roi_margin)
                ys, xs = np.nonzero(masks.any(axis=0))
                if ys.size:
                    y0 = int(ys.min()) - mg
                    y1 = int(ys.max()) + mg + 1
                    x0 = int(xs.min()) - mg
                    x1 = int(xs.max()) + mg + 1
                else:
                    y0 = y1 = x0 = x1 = 0
            else:
                y0, y1, x0, x1 = (int(v) for v in output_roi)
            # snap to 16-px multiples: slice programs cache across videos
            y0 = max(0, (y0 // 16) * 16)
            x0 = max(0, (x0 // 16) * 16)
            y1 = min(h, -(-y1 // 16) * 16)
            x1 = min(w, -(-x1 // 16) * 16)
            if y1 > y0 and x1 > x0 and (y1 - y0) * (x1 - x0) < h * w:
                roi = (y0, y1, x0, x1)

        clip_len = min(cfg.clip_length, T)
        (encode, encode_masked_u8, encode_u8, denoise_window, decode,
         encode_masked_yuv, encode_yuv) = self._get_jitted(clip_len)

        # mesh staging: EVERY device program's frame-axis operands are
        # device_put frame-sharded over "data" — VAE encode chunks,
        # denoise windows, and VAE decode batches alike (VERDICT r3 #1:
        # a denoise-only mesh caps 8-chip speedup at ~1.4x by Amdahl).
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from videovanish_tpu.core.mesh import DATA_AXIS
            _bs = NamedSharding(self.mesh, P(DATA_AXIS))
            _rep = NamedSharding(self.mesh, P())
            _ndev = self.mesh.shape[DATA_AXIS]

            def put(a):
                # frame axis must tile evenly over "data"; pick clip_length
                # as a multiple of the data-axis size for full SPMD —
                # otherwise this window replicates (it must still live on
                # the mesh's device set: params are mesh-replicated, and
                # jit rejects inputs committed to different device sets)
                if a.shape[0] % _ndev == 0:
                    return jax.device_put(a, _bs)
                return jax.device_put(a, _rep)
        else:
            def put(a):
                return a

        # upload wire format: I420 halves the bytes/frame crossing the
        # serial host link (ops/colorspace.py); chroma subsampling only
        # touches the model's INPUT — unmasked output pixels come from
        # the host-resident RGB originals. VV_UPLOAD=rgb opts out (and
        # CPU/virtual-device runs default to the exact RGB path).
        upload = os.environ.get("VV_UPLOAD", "auto")
        if upload == "auto":
            upload = "yuv420" if jax.default_backend() == "tpu" else "rgb"
        use_yuv = upload == "yuv420" and h % 2 == 0 and w % 2 == 0

        prog(5, "VAE-encoding frames")
        # upload + encode in uint8 sub-batches (VAE activation memory
        # stays bounded by the sub-batch size at high resolutions); all
        # chunks encode eagerly before denoising — lazy per-window
        # encoding measured neutral-to-negative on this transport, where
        # host->device transfers do not overlap device compute
        chunk = 8
        pad = (-T) % chunk
        fr_p = np.concatenate([frames, frames[-1:].repeat(pad, 0)], 0) \
            if pad else frames
        mk_p = np.concatenate([masks, masks[-1:].repeat(pad, 0)], 0) \
            if pad else masks
        pf_p = None if pf is None else (np.concatenate(
            [pf, pf[-1:].repeat(pad, 0)], 0) if pad else pf)
        pf01_p = None if pf01_dev is None else (jnp.concatenate(
            [pf01_dev, jnp.repeat(pf01_dev[-1:], pad, 0)], 0)
            if pad else pf01_dev)
        lat_c, mlat_c, prior_c = [], [], []

        # bit-pack masks once: 8x fewer bytes over the serial host link
        mk_bits = np.packbits(mk_p > 0, axis=-1)

        if use_yuv:
            from videovanish_tpu.ops.colorspace import rgb_to_yuv420_host
            fr_wire = rgb_to_yuv420_host(fr_p)
            pf_wire = None if pf_p is None else rgb_to_yuv420_host(pf_p)
            enc_masked = encode_masked_yuv
            enc_prior = encode_yuv
        else:
            fr_wire, pf_wire = fr_p, pf_p
            enc_masked = encode_masked_u8
            enc_prior = encode_u8

        def ensure_encoded(upto: int):
            """Encode chunks until frames [0, upto) have latents; under a
            mesh each chunk uploads frame-sharded (chunk=8 tiles over any
            power-of-two data axis), so the VAE encoders run SPMD."""
            while len(lat_c) * chunk < upto:
                i = len(lat_c) * chunk
                fr_dev = put(jnp.asarray(fr_wire[i:i + chunk]))
                record_sharding("vae_encode", frames=fr_dev)
                lat, mlat = enc_masked(
                    self.params, fr_dev,
                    put(jnp.asarray(mk_bits[i:i + chunk])))
                lat_c.append(lat)
                mlat_c.append(mlat)
                if pf_wire is not None:
                    prior_c.append(enc_prior(
                        self.params, put(jnp.asarray(pf_wire[i:i + chunk]))))
                elif pf01_p is not None:
                    prior_c.append(encode(
                        self.params, put(pf01_p[i:i + chunk])))

        # noise is a pure function of the GLOBAL frame index: overlapping
        # windows agree within a video, and overlapping CHUNKS agree
        # across a chunked long-video run (bitwise — fold_in is
        # deterministic), per BASELINE config 4
        base_key = jax.random.PRNGKey(self.seed)
        noise = jax.vmap(lambda i: jax.random.normal(
            jax.random.fold_in(base_key, i),
            (h8, w8, cfg.sample_channels), jnp.float32))(
            jnp.arange(frame_offset, frame_offset + T))

        plan = make_window_plan(T, clip_len, min(cfg.clip_overlap, clip_len - 1)
                                if clip_len > 1 else 0)
        acc = jnp.zeros((T, h8, w8, cfg.sample_channels), jnp.float32)
        wsum = jnp.zeros((T, 1, 1, 1), jnp.float32)
        carry_n = 0
        if latent_carry is not None:
            z_in, w_in = latent_carry
            carry_n = int(z_in.shape[0])
            acc = acc.at[:carry_n].set(jnp.asarray(z_in, jnp.float32))
            wsum = wsum.at[:carry_n].set(jnp.asarray(w_in, jnp.float32))
        T_out = T - int(return_latent_tail)
        assert T_out > 0, "return_latent_tail must leave frames to emit"
        prompt_emb = jnp.asarray(prompt_embeds) if prompt_embeds is not None \
            else self.params["null_text_emb"]
        # Stream the pipeline: as soon as a frame's last covering window
        # has been blended it is decoded and its device->host fetch starts
        # asynchronously, so the ~25 MB/s tunnel transfer of finished
        # frames hides behind the denoise of later windows.
        chunk = 8
        chunks = []
        decoded_upto = 0

        def decode_final(upto):
            """Decode finalized frames [decoded_upto, upto) in sub-batches
            and kick off their async host fetch. Frames past T_out (the
            withheld latent tail) are never decoded."""
            nonlocal decoded_upto
            upto = min(upto, T_out)
            while decoded_upto < upto:
                i = decoded_upto
                n = min(chunk, T_out - i)
                if n < chunk and T_out >= chunk:
                    # keep one static decode shape: shift the window back
                    if upto < T_out:
                        break  # wait for more finalized frames
                    i = T_out - chunk
                    n = chunk
                z_c = jax.lax.dynamic_slice_in_dim(
                    acc, i, min(chunk, T)) / jax.lax.dynamic_slice_in_dim(
                        wsum, i, min(chunk, T))
                z_c = put(z_c)
                record_sharding("vae_decode", latents=z_c)
                u8 = decode(self.params, z_c)
                if roi is not None:
                    u8 = u8[:, roi[0]:roi[1], roi[2]:roi[3]]
                try:
                    u8.copy_to_host_async()
                except Exception:
                    pass
                chunks.append((decoded_upto, i, u8))
                decoded_upto = min(i + n, upto)

        # sub-stage breakdown (VV_SYNC_STAGES=1 adds a device sync after
        # each phase so the wall-clock split is honest; off by default —
        # syncing serializes the async dispatch stream)
        do_sync = os.environ.get("VV_SYNC_STAGES") == "1"

        def sync(x):
            if do_sync:
                float(jnp.sum(x[..., :1].astype(jnp.float32)))

        # encode everything upfront: through this host link, transfers do
        # not overlap device compute (measured), so lazy per-window
        # encoding buys nothing and adds per-window concat work
        bytes_up = int(fr_wire[:T].nbytes + mk_bits[:T].nbytes
                       + (pf_wire[:T].nbytes if pf_wire is not None else 0))
        with stage_timer("dn.upload_encode", frames=T, wire=upload,
                         bytes_up=bytes_up):
            ensure_encoded(T)
            masked_lat = jnp.concatenate(lat_c, 0)
            m_lat = jnp.concatenate(mlat_c, 0)
            prior_lat = jnp.concatenate(prior_c, 0) if prior_c else masked_lat
            sync(prior_lat)
            sync(masked_lat)

        t_windows = time.perf_counter()
        for wi, (s, L) in enumerate(plan):
            prog(10 + 70 * wi / max(1, len(plan)),
                 f"denoising window {wi + 1}/{len(plan)}")
            w_prior = put(jax.lax.dynamic_slice_in_dim(prior_lat, s, L))
            record_sharding("denoise_window", prior_lat=w_prior)
            z = denoise_window(
                self.params,
                w_prior,
                put(jax.lax.dynamic_slice_in_dim(masked_lat, s, L)),
                put(jax.lax.dynamic_slice_in_dim(m_lat, s, L)),
                put(jax.lax.dynamic_slice_in_dim(noise, s, L)),
                prompt_emb,
                guidance=float(guidance_scale or 0.0))
            bw = window_blend_weights(
                L, min(cfg.clip_overlap, L - 1) if L > 1 else 0,
                # with a latent carry the chunk's first edge must RAMP
                # (the previous chunk's tail ramps down into it); with a
                # withheld tail the last edge ramps for the next chunk
                is_first=(wi == 0 and carry_n == 0),
                is_last=(wi == len(plan) - 1 and return_latent_tail == 0))
            bwj = jnp.asarray(bw)[:, None, None, None]
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, jax.lax.dynamic_slice_in_dim(acc, s, L) + bwj * z, s, axis=0)
            wsum = jax.lax.dynamic_update_slice_in_dim(
                wsum, jax.lax.dynamic_slice_in_dim(wsum, s, L) + bwj, s, axis=0)
            # frames before the next window's start are final now
            final_upto = plan[wi + 1][0] if wi + 1 < len(plan) else T
            decode_final(final_upto)
        if do_sync:
            sync(acc)
        # unsynced wall = dispatch cost only (device completion bills to
        # the blocking decode fetch below); synced = honest phase wall
        _emit_stage("dn.windows", time.perf_counter() - t_windows,
                    windows=len(plan), synced=int(do_sync))

        prog(85, "VAE-decoding frames")
        t_fetch = time.perf_counter()
        out = np.empty((T_out, h, w, 3), np.uint8)
        if roi is not None:
            out[:] = frames[:T_out]  # out-of-ROI pixels = resized input
        fetch_bytes = 0
        for start, i, u8 in chunks:
            arr = np.asarray(u8)
            fetch_bytes += arr.nbytes
            # the decode batch covers [i, i+chunk); frames before `start`
            # in it were already written by an earlier chunk
            end = min(i + chunk, T_out)
            if roi is None:
                out[start:end] = arr[start - i:end - i]
            else:
                out[start:end, roi[0]:roi[1], roi[2]:roi[3]] = \
                    arr[start - i:end - i]
        # this is the BLOCKING drain of the async dispatch stream: with
        # VV_SYNC_STAGES off, all remaining device time bills here, so
        # (dn.decode_fetch - device_time_outstanding) ~= tunnel transfer
        # + host wait. dispatches counts every jit call of this forward
        # (each costs ~1-2 ms host-side through the tunnel).
        _emit_stage("dn.decode_fetch", time.perf_counter() - t_fetch,
                    frames=T_out, synced=int(do_sync),
                    fetch_bytes=fetch_bytes,
                    dispatches=len(lat_c) + len(prior_c) + 2 * len(plan)
                    + 2 * len(chunks))
        prog(100, "diffusion inpainting done")
        if return_latent_tail:
            return ([out[i] for i in range(T_out)],
                    (acc[T_out:], wsum[T_out:]))
        return [out[i] for i in range(T)]

    __call__ = forward
