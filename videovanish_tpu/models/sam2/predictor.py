"""SAM2 streaming video predictor.

API parity with the reference's call surface (sam2_masker.py:84-143):
  build_sam2_video_predictor(...) -> predictor
  predictor.init_state(video_path=<list of HxWx3 uint8 RGB frames>)
  predictor.add_new_points_or_box(inference_state, frame_idx, obj_id,
                                  points=Nx2 f32 px, labels=N i32 | box xyxy)
  predictor.propagate_in_video(state) -> yields (frame_idx, obj_ids, logits)
with masks binarized at logit 0 by the caller (sam2_masker.py:145).

TPU-native streaming design (internals [external] per SURVEY.md §2c):
  - one jitted program per stage (encode / decode / memory-encode) with
    static shapes; the per-frame Python loop only routes arrays;
  - fixed-size memory bank per object: num_maskmem spatial slots (cond
    frames pinned, recents ring-evicted) + max_obj_ptrs pointer slots,
    invalid slots masked in attention — no dynamic shapes ever;
  - objects ride a leading batch axis; the image is encoded once per
    frame and shared across objects.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videovanish_tpu.config import Sam2Config
from videovanish_tpu.core.checkpoint import maybe_load
from videovanish_tpu.models.sam2.decoder import MaskDecoder
from videovanish_tpu.models.sam2.hiera import Hiera
from videovanish_tpu.models.sam2.memory import MemoryAttention, MemoryEncoder
from videovanish_tpu.models.sam2.neck import FpnNeck, sine_pos_embed_2d
from videovanish_tpu.models.sam2.prompt import MAX_POINTS, PromptEncoder
from videovanish_tpu.ops.colorspace import rgb_to_yuv420_host
from videovanish_tpu.ops.resize import resize_bilinear
from videovanish_tpu.utils.observability import record_stage

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# Frames batch-encoded per upload during propagation: amortizes the
# ~1-2 ms per-dispatch tunnel overhead and keeps the backbone MXU-dense
# without holding more than CH frames of Hiera activations at once.
ENCODE_CHUNK = 8


@jax.jit
def _pack_binary_masks(logits):
    """(O, H, W) logits -> (O, H, ceil(W/8)) bit-packed (logits > 0),
    big-endian bit order (np.unpackbits default). Shipping 1 bit/px over
    the serial host link instead of 1 f32/px is a 32x byte cut."""
    O, H, W = logits.shape
    wp = -(-W // 8) * 8
    b = (logits > 0.0).astype(jnp.int32)
    b = jnp.pad(b, ((0, 0), (0, 0), (0, wp - W)))
    b = b.reshape(O, H, wp // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


class _BankMeta:
    """Host-side occupancy metadata for the DEVICE-resident memory bank.

    All objects are processed on the same frames, so slot occupancy is
    shared across objects; only the contents (device arrays) differ.
    Cond-frame slots are pinned; recent slots ring-evict oldest-first.
    The feature/pointer tensors themselves never leave the device
    (dynamic_update_slice inside the fused per-frame step) — the original
    host-roundtrip design moved ~7MB/frame over the transport.
    """

    def __init__(self, num_maskmem: int, max_ptrs: int):
        self.num_maskmem = num_maskmem
        self.max_ptrs = max_ptrs
        self.slots: list = [None] * num_maskmem  # (frame_idx, is_cond)
        self.ptr_slot_frame: list = [None] * max_ptrs  # frame_idx per slot
        self.ptr_next = 0

    def choose_slot(self, frame_idx: int, is_cond: bool) -> int:
        for i, s in enumerate(self.slots):
            if s is None:
                self.slots[i] = (frame_idx, is_cond)
                return i
        cand = [(s[0], i) for i, s in enumerate(self.slots) if not s[1]]
        if not cand:
            cand = [(s[0], i) for i, s in enumerate(self.slots)]
        _, i = min(cand)
        self.slots[i] = (frame_idx, is_cond)
        return i

    def choose_ptr_slot(self, frame_idx: int, is_cond: bool = False) -> int:
        """Conditioning-frame pointers are pinned (the official model
        keeps them for the whole video); tracked-frame pointers ring-evict
        among the remaining slots."""
        slots = self.ptr_slot_frame
        if is_cond:
            for i, s in enumerate(slots):
                if s is None or not s[1]:
                    slots[i] = (frame_idx, True)
                    return i
            slots[0] = (frame_idx, True)
            return 0
        order = [i for i in range(self.max_ptrs)
                 if slots[i] is None or not slots[i][1]]
        if not order:  # all pinned: overwrite the oldest cond
            order = list(range(self.max_ptrs))
        i = order[self.ptr_next % len(order)]
        self.ptr_next += 1
        slots[i] = (frame_idx, False)
        return i

    def valid_age(self, cur_frame: int):
        """Official temporal-position semantics: conditioning slots use
        tpos index num_maskmem-1 (relative offset 0); tracked slots at
        temporal distance d in 1..num_maskmem-1 use index d-1; tracked
        frames farther than num_maskmem-1 are NOT attended (the official
        memory window)."""
        n = self.num_maskmem
        valid = np.zeros((n,), bool)
        tpos = np.zeros((n,), np.int32)
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            frame, is_cond = s
            d = abs(cur_frame - frame)
            if is_cond:
                valid[i] = True
                tpos[i] = n - 1
            elif 1 <= d <= n - 1:
                valid[i] = True
                tpos[i] = d - 1
        return valid, tpos

    def ptr_valid_tdiff(self, cur_frame: int, reverse: bool,
                        num_total_frames: int):
        """Per-pointer-slot validity + NORMALIZED signed temporal offsets,
        matching the official _get_object_pointers: conditioning-frame
        pointers from the past (w.r.t. tracking direction) at any offset;
        tracked-frame pointers only within max_object_pointers_to_use - 1;
        offsets normalized by (max_object_pointers_to_use - 1)."""
        max_use = min(num_total_frames, self.max_ptrs) \
            if num_total_frames else self.max_ptrs
        v = np.zeros((self.max_ptrs,), bool)
        td = np.zeros((self.max_ptrs,), np.float32)
        sign = -1.0 if reverse else 1.0
        for i, s in enumerate(self.ptr_slot_frame):
            if s is None:
                continue
            frame, is_cond = s
            diff = sign * float(cur_frame - frame)
            if is_cond:
                ok = diff >= 0  # past-only during eval
            else:
                ok = 1 <= diff <= max_use - 1
            if ok:
                v[i] = True
                td[i] = diff / max(max_use - 1, 1)
        return v, td


class Sam2VideoPredictor:
    def __init__(self, config: Optional[Sam2Config] = None, params=None,
                 seed: int = 0, compute_dtype=jnp.bfloat16):
        self.cfg = config or Sam2Config()
        self.dtype = compute_dtype if jax.default_backend() == "tpu" \
            else jnp.float32
        cfg = self.cfg

        self.hiera = Hiera(
            embed_dim=cfg.hiera_embed_dim, num_heads=cfg.hiera_num_heads,
            stages=cfg.hiera_stages, window_spec=cfg.hiera_window_spec,
            global_att_blocks=cfg.hiera_global_att_blocks,
            pos_embed_bkg_size=cfg.hiera_window_pos_embed_bkg_spatial_size,
            dtype=self.dtype)
        self.neck = FpnNeck(d_model=cfg.neck_d_model, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(embed_dim=cfg.neck_d_model,
                                            image_size=cfg.image_size)
        self.decoder = MaskDecoder(
            embed_dim=cfg.neck_d_model,
            num_multimask_outputs=cfg.num_multimask_outputs,
            iou_head_depth=cfg.iou_head_depth, dtype=self.dtype)
        self.memory_attention = MemoryAttention(
            num_layers=cfg.memory_attention_layers,
            d_model=cfg.memory_attention_d_model, kv_dim=cfg.mem_dim,
            dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(
            d_model=cfg.neck_d_model, mem_dim=cfg.mem_dim, dtype=self.dtype)

        self.s16 = cfg.image_size // 16
        self.tokens16 = self.s16 * self.s16
        self.params = params if params is not None else self._init_params(seed)
        self._jit = {}

    # ------------------------------------------------------------------
    def _init_params(self, seed: int):
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 8)
        img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), self.dtype)
        big = cfg.hiera_embed_dim >= 96

        def init(fn, *a):
            if big:
                from videovanish_tpu.core.precision import zeros_like_shapes
                return zeros_like_shapes(jax.eval_shape(fn, *a)["params"])
            return fn(*a)["params"]

        hiera_p = init(self.hiera.init, ks[0], img)
        feats_shapes = jax.eval_shape(
            lambda p, x: self.hiera.apply({"params": p}, x), hiera_p, img)
        feats = [jnp.zeros(s.shape, s.dtype) for s in feats_shapes]
        neck_p = init(self.neck.init, ks[1], feats)

        d = cfg.neck_d_model
        s16 = self.s16
        pe_p = self.prompt_encoder.init(
            ks[2], jnp.zeros((1, MAX_POINTS, 2)),
            jnp.full((1, MAX_POINTS), -1, jnp.int32))["params"]
        dec_p = init(
            lambda k: self.decoder.init(
                k, jnp.zeros((1, s16, s16, d), self.dtype),
                jnp.zeros((1, s16, s16, d)),
                jnp.zeros((1, MAX_POINTS, d), self.dtype),
                jnp.zeros((1, s16 * 4, s16 * 4, d), self.dtype),
                jnp.zeros((1, s16 * 2, s16 * 2, d), self.dtype)), ks[3])
        mem_tokens = self.tokens16 * cfg.num_maskmem + \
            cfg.max_obj_ptrs_in_encoder * (d // cfg.mem_dim)
        ma_p = init(
            lambda k: self.memory_attention.init(
                k, jnp.zeros((1, self.tokens16, d), self.dtype),
                jnp.zeros((1, self.tokens16, d)),
                jnp.zeros((1, mem_tokens, cfg.mem_dim), self.dtype),
                jnp.zeros((1, mem_tokens, cfg.mem_dim)),
                jnp.zeros((1, mem_tokens), bool)), ks[4])
        me_p = init(
            lambda k: self.memory_encoder.init(
                k, jnp.zeros((1, s16, s16, d), self.dtype),
                jnp.zeros((1, cfg.image_size, cfg.image_size, 1),
                          self.dtype)), ks[5])

        # learned temporal position embedding per memory age + the
        # official video-level parameters (transformers Sam2VideoModel
        # names in parentheses): no_memory_embedding, no_object_pointer,
        # occlusion_spatial_embedding(_parameter), obj_ptr_tpos_proj
        # (temporal_positional_encoding_projection_layer)
        tpos = jax.random.normal(ks[6], (cfg.num_maskmem, cfg.mem_dim),
                                 jnp.float32) * 0.02
        k7, k8, k9 = jax.random.split(ks[7], 3)
        params = {
            "hiera": hiera_p, "neck": neck_p, "prompt_encoder": pe_p,
            "decoder": dec_p, "memory_attention": ma_p,
            "memory_encoder": me_p, "maskmem_tpos_enc": tpos,
            "no_memory_embedding": jnp.zeros((1, 1, d), jnp.float32),
            "no_object_pointer": jnp.zeros((d,), jnp.float32),
            "occlusion_spatial_embedding": jnp.zeros((cfg.mem_dim,),
                                                     jnp.float32),
            "obj_ptr_tpos_proj": {
                "kernel": jax.random.normal(
                    k7, (d, cfg.mem_dim), jnp.float32) * (d ** -0.5),
                "bias": jnp.zeros((cfg.mem_dim,), jnp.float32),
            },
        }
        loaded = maybe_load(cfg.checkpoint, like=params)
        return loaded if loaded is not None else params

    # ------------------------------------------------------------------
    def _fns(self, H0: int, W0: int):
        key = (H0, W0)
        if key in self._jit:
            return self._jit[key]
        cfg = self.cfg
        d = cfg.neck_d_model
        s16 = self.s16
        pos16 = jnp.asarray(sine_pos_embed_2d(s16, s16, d))
        mem_spatial_pos = jnp.asarray(
            sine_pos_embed_2d(s16, s16, cfg.mem_dim)).reshape(
                self.tokens16, cfg.mem_dim)

        def _encode_from01(params, img01):
            """(N, H0, W0, 3) f32 [0,1] -> (s4, s8, s16) @ d channels,
            batched over frames (N > 1 amortizes dispatch overhead and
            keeps the conv backbone MXU-dense)."""
            if img01.shape[1:3] != (cfg.image_size, cfg.image_size):
                img01 = resize_bilinear(img01, cfg.image_size,
                                        cfg.image_size)
            x = (img01 - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)
            feats = self.hiera.apply({"params": params["hiera"]},
                                     x.astype(self.dtype))
            (f4, f8, f16, f32), _pos = self.neck.apply(
                {"params": params["neck"]}, feats)
            return f4, f8, f16

        @jax.jit
        def encode_image(params, img_u8):
            """img_u8: (N, H0, W0, 3) uint8. Resize to the model square +
            imagenet normalization run on device so only uint8 crosses
            the host link."""
            return _encode_from01(params, img_u8.astype(jnp.float32) / 255.0)

        @jax.jit
        def encode_image_yuv(params, yuv_u8):
            """yuv_u8: (N, H0*3//2, W0) I420 uint8 — 2x fewer bytes over
            the serial host link than RGB (ops/colorspace.py)."""
            from videovanish_tpu.ops.colorspace import yuv420_to_rgb01
            return _encode_from01(params, yuv420_to_rgb01(yuv_u8))

        @jax.jit
        def decode(params, f16, f4, f8, mem_feats, mem_valid, mem_age,
                   ptr_feats, ptr_valid, ptr_tdiff, points, labels):
            """Batched over objects (leading axis O).
            f16: (1, s16, s16, d) shared; mem_feats: (O, n, T16, mem)
            ptr_tdiff: (O, max_ptrs) signed temporal offsets
            points: (O, MAX_POINTS, 2) px; labels: (O, MAX_POINTS)."""
            O = mem_feats.shape[0]
            n = cfg.num_maskmem
            splits = d // cfg.mem_dim

            # memory kv: spatial slots + ptr tokens
            tpos = params["maskmem_tpos_enc"][mem_age]  # (O, n, mem)
            mem_pos_sp = mem_spatial_pos[None, None] + tpos[:, :, None, :]
            kv_sp = mem_feats.reshape(O, n * self.tokens16, cfg.mem_dim)
            pos_sp = mem_pos_sp.reshape(O, n * self.tokens16, cfg.mem_dim)
            valid_sp = jnp.repeat(mem_valid, self.tokens16, axis=1)

            # object-pointer temporal positions (official: 1D sine PE of
            # the normalized signed offset, projected d -> mem_dim,
            # repeated per pointer split)
            tnorm = ptr_tdiff  # pre-normalized on host (official rule)
            pe_dim = d // 2
            dim_t = 10000.0 ** (2.0 * (jnp.arange(pe_dim) // 2) / pe_dim)
            ang = tnorm[..., None] / dim_t  # (O, max_ptrs, d/2)
            sine_pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
            proj = params["obj_ptr_tpos_proj"]
            ptr_pos = sine_pe @ proj["kernel"] + proj["bias"]  # (O, P, mem)
            ptr_pos = jnp.repeat(ptr_pos, splits, axis=1)

            kv = jnp.concatenate([kv_sp, ptr_feats], axis=1).astype(self.dtype)
            pos = jnp.concatenate([pos_sp, ptr_pos], axis=1)
            valid = jnp.concatenate([valid_sp, ptr_valid], axis=1)

            x = jnp.broadcast_to(f16.reshape(1, self.tokens16, d),
                                 (O, self.tokens16, d)).astype(self.dtype)
            any_mem = jnp.any(valid, axis=1, keepdims=True)  # (O, 1)
            cond = self.memory_attention.apply(
                {"params": params["memory_attention"]},
                x, pos16.reshape(1, self.tokens16, d), kv, pos, valid)
            # initial conditioning frame (no memory yet): the official
            # model adds a learned no-memory embedding instead
            no_mem = x + params["no_memory_embedding"].astype(x.dtype)
            x = jnp.where(any_mem[..., None], cond, no_mem)
            x = x.reshape(O, s16, s16, d)

            sparse, no_mask = self.prompt_encoder.apply(
                {"params": params["prompt_encoder"]}, points, labels)
            # official token set: real clicks/corners + exactly ONE
            # not_a_point pad token; the remaining static MAX_POINTS slots
            # are masked out of the decoder attention so the fixed-shape
            # program reproduces the official variable-length math
            real = labels >= 0                               # (O, P)
            pad_rank = jnp.cumsum((~real).astype(jnp.int32), axis=1)
            sparse_valid = real | ((pad_rank == 1) & ~real)

            # official _forward_sam_heads: dense no-mask embedding added
            # to the (memory-conditioned) image features, and the decoder
            # image PE is the prompt encoder's random-Fourier dense PE
            x = x + no_mask.astype(x.dtype)[None, None, None]
            dense_pe = self.prompt_encoder.apply(
                {"params": params["prompt_encoder"]}, s16, s16,
                method=self.prompt_encoder.dense_pe)

            out = self.decoder.apply(
                {"params": params["decoder"]}, x,
                jnp.broadcast_to(dense_pe[None], (O, s16, s16, d)),
                sparse.astype(self.dtype),
                jnp.broadcast_to(f4, (O,) + f4.shape[1:]),
                jnp.broadcast_to(f8, (O,) + f8.shape[1:]),
                sparse_valid=sparse_valid)

            # official mask selection (_use_multimask / _forward_sam_heads):
            # multimask (best of slots 1..3 by IoU) when the frame has at
            # most 1 click; single mask (slot 0) otherwise; masks forced
            # to NO_OBJ_SCORE when the object is predicted absent
            NO_OBJ_SCORE = -1024.0
            n_pts = jnp.sum(labels >= 0, axis=1)  # (O,)
            multi = n_pts <= 1
            best_multi = jnp.argmax(out["iou"][:, 1:], axis=-1) + 1
            best = jnp.where(multi, best_multi, 0)  # (O,)
            masks_all = out["masks"]
            obj_appearing = out["obj_score"][:, 0] > 0  # (O,)
            masks_all = jnp.where(obj_appearing[:, None, None, None],
                                  masks_all, NO_OBJ_SCORE)
            masks = jnp.take_along_axis(
                masks_all, best[:, None, None, None], axis=1)[:, 0]
            # occlusion-aware object pointer: lambda*ptr + (1-lambda)*no_ptr
            ptr_sel = jnp.take_along_axis(
                out["obj_ptrs"], best[:, None, None], axis=1)[:, 0]
            lam = obj_appearing.astype(ptr_sel.dtype)[:, None]
            obj_ptr = lam * ptr_sel + \
                (1.0 - lam) * params["no_object_pointer"].astype(ptr_sel.dtype)
            # low-res logits at stride 4 -> full video resolution
            logits_full = resize_bilinear(masks[..., None], H0, W0)[..., 0]
            return (masks[..., None], logits_full, obj_ptr, x,
                    out["obj_score"])

        @jax.jit
        def step(params, f16, f4, f8, bank_feats, mem_valid, mem_age,
                 bank_ptrs, ptr_valid_tok, ptr_tdiff, points, labels,
                 write_slot, ptr_slot, binarize):
            """Fused per-frame propagation step: decode + memory-encode +
            in-place (device-side) bank update. Everything but the output
            logits stays on device — one dispatch per frame.

            write_slot/ptr_slot: int32 scalars (slot occupancy is shared
            across objects since all objects see the same frames);
            binarize: bool scalar — prompted frames store a hard mask in
            memory (official is_mask_from_pts)."""
            masks_s4, logits_full, obj_ptr, cond_f16, obj_score = decode(
                params, f16, f4, f8, bank_feats, mem_valid, mem_age,
                bank_ptrs, ptr_valid_tok, ptr_tdiff, points, labels)

            # official _encode_new_memory: image-resolution mask,
            # binarized on prompted frames else sigmoid, then scaled
            # (sigmoid_scale 20, bias -10) before the mask downsampler
            S = cfg.image_size
            m_hi = resize_bilinear(masks_s4, S, S)  # (O, S, S, 1) logits
            m_soft = jax.nn.sigmoid(m_hi)
            m_hard = (m_hi > 0).astype(jnp.float32)
            mask_for_mem = jnp.where(binarize, m_hard, m_soft) * 20.0 - 10.0

            new_feat = self.memory_encoder.apply(
                {"params": params["memory_encoder"]},
                cond_f16, mask_for_mem.astype(self.dtype)
            ).astype(jnp.float32)
            # occluded frames: add the learned no-object spatial embedding
            occl = params["occlusion_spatial_embedding"].astype(jnp.float32)
            not_appearing = (obj_score[:, 0] <= 0).astype(jnp.float32)
            new_feat = new_feat + \
                not_appearing[:, None, None, None] * occl[None, None, None]
            new_feat = new_feat.reshape(-1, self.tokens16, cfg.mem_dim)

            feats_next = jax.lax.dynamic_update_slice(
                bank_feats, new_feat[:, None], (0, write_slot, 0, 0))
            splits = d // cfg.mem_dim
            ptr_tok = obj_ptr.astype(jnp.float32).reshape(-1, splits,
                                                          cfg.mem_dim)
            ptrs_next = jax.lax.dynamic_update_slice(
                bank_ptrs, ptr_tok, (0, ptr_slot * splits, 0))
            return logits_full, feats_next, ptrs_next

        @functools.partial(jax.jit, static_argnames=("pack",))
        def scan_chunk(params, f4c, f8c, f16c, bank_feats, bank_ptrs,
                       mem_valid_c, mem_age_c, pvalid_c, tdiff_c, points_c,
                       labels_c, write_slot_c, ptr_slot_c, binarize_c,
                       live_c, pack=False):
            """A whole encode-chunk of sequential propagation steps fused
            into ONE dispatch via lax.scan over the chunk axis. The memory
            bank is the scan carry (stays in HBM across frames); per-frame
            prompt/occupancy metadata rides in as stacked (CH, ...) arrays
            built on host. One dispatch + ONE output fetch per CH frames
            instead of per frame — each blocking fetch through the axon
            tunnel costs a ~27 ms sync round-trip, which at CH=8 was ~45%
            of the whole 480p masking wall-clock.

            live_c: padded tail frames of the last chunk are stepped (the
            program shape is static) but their bank writes are discarded,
            so padding can't corrupt the memory state.
            pack=True fuses the bit-pack of output masks into the same
            program (1 bit/px over the serial host link)."""
            def body(carry, xs):
                feats0, ptrs0 = carry
                (f4, f8, f16, mv, ma, pv, td, pts, lbs, ws, ps, binz,
                 live) = xs
                logits_full, feats1, ptrs1 = step(
                    params, f16[None], f4[None], f8[None], feats0, mv, ma,
                    ptrs0, pv, td, pts, lbs, ws, ps, binz)
                feats1 = jnp.where(live, feats1, feats0)
                ptrs1 = jnp.where(live, ptrs1, ptrs0)
                out = _pack_binary_masks(logits_full) if pack \
                    else logits_full
                return (feats1, ptrs1), out

            (bank_feats, bank_ptrs), outs = jax.lax.scan(
                body, (bank_feats, bank_ptrs),
                (f4c, f8c, f16c, mem_valid_c, mem_age_c, pvalid_c, tdiff_c,
                 points_c, labels_c, write_slot_c, ptr_slot_c, binarize_c,
                 live_c))
            return outs, bank_feats, bank_ptrs

        fns = (encode_image, decode, step, encode_image_yuv, scan_chunk)
        self._jit[key] = fns
        return fns

    def _empty_device_bank(self, O: int):
        cfg = self.cfg
        splits = cfg.neck_d_model // cfg.mem_dim
        feats = jnp.zeros((O, cfg.num_maskmem, self.tokens16, cfg.mem_dim),
                          jnp.float32)
        ptrs = jnp.zeros((O, cfg.max_obj_ptrs_in_encoder * splits,
                          cfg.mem_dim), jnp.float32)
        return feats, ptrs

    # ------------------------------------------------------------------
    # Reference API
    # ------------------------------------------------------------------
    def init_state(self, video_path):
        """video_path: list of (H,W,3) uint8 RGB frames (the fork's
        numpy-frames contract, sam2_masker.py:89)."""
        frames = video_path
        assert len(frames) > 0
        H0, W0 = frames[0].shape[:2]
        return {
            "frames": frames,
            "H0": H0, "W0": W0,
            "prompts": {},      # frame_idx -> {obj_id: {pts, labels}}
            "obj_ids": [],
            "feat_cache": {},   # frame_idx -> (f4, f8, f16) for cond frames
        }

    def reset_state(self, inference_state):
        inference_state["prompts"] = {}
        inference_state["obj_ids"] = []
        inference_state["feat_cache"] = {}

    def add_new_points_or_box(self, inference_state, frame_idx, obj_id,
                              points=None, labels=None, box=None,
                              clear_old_points: bool = True,
                              normalize_coords: bool = True):
        state = inference_state
        H0, W0 = state["H0"], state["W0"]
        S = self.cfg.image_size
        scale_x, scale_y = S / W0, S / H0

        pts, labs = [], []
        if points is not None:
            for p, l in zip(np.asarray(points, np.float32),
                            np.asarray(labels, np.int32)):
                pts.append([p[0] * scale_x, p[1] * scale_y])
                labs.append(int(l))
        if box is not None:
            b = np.asarray(box, np.float32)
            pts.append([b[0] * scale_x, b[1] * scale_y]); labs.append(2)
            pts.append([b[2] * scale_x, b[3] * scale_y]); labs.append(3)

        fp = state["prompts"].setdefault(int(frame_idx), {})
        entry = fp.setdefault(int(obj_id), {"pts": [], "labels": []})
        if clear_old_points and points is not None:
            # replace previous clicks (labels 0/1) for this (frame, obj);
            # box corners (labels 2/3) persist unless a new box is given
            kept = [(p, l) for p, l in zip(entry["pts"], entry["labels"])
                    if l in (2, 3)]
            entry["pts"] = [p for p, _ in kept]
            entry["labels"] = [l for _, l in kept]
        if box is not None:
            # a new box replaces any previous box corners
            kept = [(p, l) for p, l in zip(entry["pts"], entry["labels"])
                    if l in (0, 1)]
            entry["pts"] = [p for p, _ in kept]
            entry["labels"] = [l for _, l in kept]
        entry["pts"].extend(pts)
        entry["labels"].extend(labs)
        if int(obj_id) not in state["obj_ids"]:
            state["obj_ids"].append(int(obj_id))

        # immediate single-frame prediction (interactive preview contract)
        frame_idx = int(frame_idx)
        logits = self._predict_prompt_frame(state, frame_idx)
        return frame_idx, list(state["obj_ids"]), logits

    # ------------------------------------------------------------------
    def _encode_frame(self, state, frame_idx):
        cache = state["feat_cache"]
        if frame_idx in cache:
            return cache[frame_idx]
        f = state["frames"][frame_idx]
        encode_image = self._fns(state["H0"], state["W0"])[0]
        # ship uint8 (the host link is the bottleneck: 4x fewer bytes
        # than f32); normalize + resize on device inside encode_image
        feats = encode_image(self.params, jnp.asarray(f)[None])
        if frame_idx in state["prompts"]:
            cache[frame_idx] = feats
        return feats

    def _prompt_arrays(self, state, frame_idx):
        O = len(state["obj_ids"])
        points = np.zeros((O, MAX_POINTS, 2), np.float32)
        labels = np.full((O, MAX_POINTS), -1, np.int32)
        fp = state["prompts"].get(frame_idx, {})
        for oi, obj_id in enumerate(state["obj_ids"]):
            e = fp.get(obj_id)
            if e is None:
                continue
            n = min(len(e["pts"]), MAX_POINTS)
            if n:
                points[oi, :n] = np.asarray(e["pts"][:n], np.float32)
                labels[oi, :n] = np.asarray(e["labels"][:n], np.int32)
        return points, labels

    def _meta_arrays(self, meta: "_BankMeta", cur_frame: int, O: int,
                     reverse: bool = False, num_total_frames: int = 0):
        """Broadcast shared occupancy metadata to per-object arrays."""
        splits = self.cfg.neck_d_model // self.cfg.mem_dim
        valid, age = meta.valid_age(cur_frame)
        pvalid, tdiff = meta.ptr_valid_tdiff(cur_frame, reverse,
                                             num_total_frames)
        pvalid_tok = np.repeat(pvalid, splits)

        def bc(a):
            # numpy out: callers stack per-frame metas into chunk arrays
            # before a single upload (jit call sites accept numpy)
            return np.broadcast_to(a, (O,) + a.shape)

        return bc(valid), bc(age), bc(pvalid_tok), bc(tdiff)

    def _predict_prompt_frame(self, state, frame_idx):
        """Memoryless single-frame decode for interactive feedback."""
        O = len(state["obj_ids"])
        f4, f8, f16 = self._encode_frame(state, frame_idx)
        decode = self._fns(state["H0"], state["W0"])[1]
        feats, ptrs = self._empty_device_bank(O)
        meta = _BankMeta(self.cfg.num_maskmem,
                         self.cfg.max_obj_ptrs_in_encoder)
        valid, age, pvalid, tdiff = self._meta_arrays(meta, frame_idx, O)
        points, labels = self._prompt_arrays(state, frame_idx)
        _, logits_full, _, _, _ = decode(
            self.params, f16, f4, f8, feats, valid, age, ptrs, pvalid,
            tdiff, jnp.asarray(points), jnp.asarray(labels))
        return np.asarray(logits_full)

    def propagate_in_video(self, inference_state, start_frame_idx=None,
                           max_frame_num_to_track=None, reverse=False,
                           yield_binary: bool = False):
        """Yield (frame_idx, obj_ids, mask_logits) streaming through the
        video from the first prompted frame (reference consumption at
        sam2_masker.py:143-147).

        yield_binary: yield uint8 0/1 masks (logits > 0 computed on
        device) instead of f32 logits; the masks additionally cross the
        host link BIT-PACKED (32x fewer bytes than f32 logits — the
        serial ~15-50 MB/s link is the mask-FPS bottleneck) and are
        unpacked here before yielding, so the caller-visible contract is
        unchanged. The pipeline layer uses this since it thresholds at 0
        anyway (sam2_masker.py:145)."""
        state = inference_state
        obj_ids = list(state["obj_ids"])
        O = len(obj_ids)
        if O == 0:
            return
        T = len(state["frames"])
        prompt_frames = sorted(state["prompts"].keys())
        first = start_frame_idx if start_frame_idx is not None \
            else (prompt_frames[0] if prompt_frames else 0)
        if reverse:
            stop = -1 if max_frame_num_to_track is None \
                else max(-1, first - max_frame_num_to_track)
            frame_order = range(first, stop, -1)
        else:
            last = T if max_frame_num_to_track is None \
                else min(T, first + max_frame_num_to_track)
            frame_order = range(first, last)

        fns = self._fns(state["H0"], state["W0"])
        encode_rgb, encode_yuv, scan_chunk = fns[0], fns[3], fns[4]
        feats, ptrs = self._empty_device_bank(O)
        meta = _BankMeta(self.cfg.num_maskmem,
                         self.cfg.max_obj_ptrs_in_encoder)

        H0, W0 = state["H0"], state["W0"]
        frames = state["frames"]
        idxs = list(frame_order)
        # I420 wire needs even dims; odd videos fall back to RGB uint8
        use_yuv = (self.cfg.wire == "yuv420") \
            and (H0 % 2 == 0) and (W0 % 2 == 0)
        CH = ENCODE_CHUNK

        def encode_chunk(pos, ch):
            """Batch-encode idxs[pos:pos+ch] in ONE upload + dispatch
            (padded by repeating the final frame so the jit program shape
            is static). YUV420 wire = 2x fewer bytes over the serial host
            link. Timers measure host-side cost only: dispatch returns
            before device compute finishes (the axon tunnel is async);
            device time lands in sam2.fetch."""
            sel = idxs[pos:pos + ch]
            t0 = time.perf_counter()
            arrs = [np.asarray(frames[i]) for i in sel]
            arrs += [arrs[-1]] * (ch - len(arrs))
            batch = np.stack(arrs)
            wire = rgb_to_yuv420_host(batch) if use_yuv else batch
            t1 = time.perf_counter()
            record_stage("sam2.wire_prep", t1 - t0, frames=len(sel),
                         bytes=int(wire.nbytes))
            out = (encode_yuv if use_yuv else encode_rgb)(self.params, wire)
            record_stage("sam2.encode_dispatch", time.perf_counter() - t1,
                         frames=len(sel))
            return out

        def unpack(arr):  # (CH, O, H, Wp) packed -> (CH, O, H, W0) 0/1
            return np.unpackbits(arr, axis=-1)[..., :W0]

        def fetch_yield(sel, dev):
            t3 = time.perf_counter()
            arr = np.asarray(dev)  # (CH, O, H0, Wp|W0)
            record_stage("sam2.fetch", time.perf_counter() - t3,
                         frames=len(sel))
            arr = unpack(arr) if yield_binary else arr
            for j, pt in enumerate(sel):
                yield pt, obj_ids, [arr[j, i] for i in range(O)]

        pending = None  # one-chunk fetch lookahead
        for pos in range(0, len(idxs), CH):
            sel = idxs[pos:pos + CH]
            # pad the tail chunk to the next power of two instead of CH:
            # a 1-frame interactive preview then steps/encodes 1 frame,
            # not 8, at the cost of <= log2(CH)+1 compiled programs
            ch = 1
            while ch < len(sel):
                ch *= 2
            chunk = encode_chunk(pos, ch)
            # host-side sequential occupancy: frame j's validity/ages are
            # from occupancy BEFORE it writes, exactly as the per-frame
            # loop computed them; padded tail repeats the last frame but
            # is marked not-live (no bank write, output discarded)
            mv, ma, pv, td, pts_c, lbs_c = [], [], [], [], [], []
            ws_c, ps_c, bz_c, lv_c = [], [], [], []
            for j in range(ch):
                live = j < len(sel)
                t = sel[j] if live else sel[-1]
                is_cond = live and (t in state["prompts"])
                valid, age, pvalid, tdiff = self._meta_arrays(
                    meta, t, O, reverse=reverse, num_total_frames=T)
                if is_cond:
                    points, labels = self._prompt_arrays(state, t)
                else:
                    points = np.zeros((O, MAX_POINTS, 2), np.float32)
                    labels = np.full((O, MAX_POINTS), -1, np.int32)
                if live:
                    ws = meta.choose_slot(t, is_cond)
                    ps = meta.choose_ptr_slot(t, is_cond)
                else:
                    ws, ps = 0, 0
                mv.append(valid); ma.append(age); pv.append(pvalid)
                td.append(tdiff); pts_c.append(points); lbs_c.append(labels)
                ws_c.append(ws); ps_c.append(ps); bz_c.append(is_cond)
                lv_c.append(live)
            t2 = time.perf_counter()
            dev, feats, ptrs = scan_chunk(
                self.params, chunk[0], chunk[1], chunk[2], feats, ptrs,
                np.stack(mv), np.stack(ma), np.stack(pv), np.stack(td),
                np.stack(pts_c), np.stack(lbs_c),
                np.asarray(ws_c, np.int32), np.asarray(ps_c, np.int32),
                np.asarray(bz_c, bool), np.asarray(lv_c, bool),
                pack=yield_binary)
            record_stage("sam2.step_dispatch", time.perf_counter() - t2,
                         frames=len(sel))
            try:  # overlap this chunk's host fetch with the next's steps
                dev.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                yield from fetch_yield(*pending)
            pending = (sel, dev)
        if pending is not None:
            yield from fetch_yield(*pending)


def build_sam2_video_predictor(config_file=None, ckpt_path=None, device=None,
                               config: Optional[Sam2Config] = None,
                               **kwargs) -> Sam2VideoPredictor:
    """Factory matching the reference call
    `build_sam2_video_predictor(SAM2_MODEL_CFG, SAM2_CHECKPOINT, device=...)`
    (sam2_masker.py:84). config_file/ckpt_path/device are accepted for
    compatibility; the orbax checkpoint comes from the Sam2Config."""
    return Sam2VideoPredictor(config=config)
