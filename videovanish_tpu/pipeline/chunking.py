"""Chunked long-video driver: streaming file-to-file object removal.

First-class implementation of what the reference left as a roadmap item
(README.md:76 "chunking with overlap"; its deps only chunk internally,
SURVEY.md §5 long-context row). Design:

  - frames stream from disk chunk-at-a-time (VideoFrameReader) — a
    1000+-frame 720p video never fully materializes on host;
  - each chunk runs the full prior+diffusion+composite pipeline; chunks
    share `overlap` frames and blend IN LATENT SPACE (BASELINE config
    4): denoise noise is a pure function of the global frame index, a
    chunk withholds its overlap tail from VAE decode and hands the
    blend accumulators to the next chunk, which ramps its own windows
    into them — a chunk seam is then the same latent cross-fade as an
    in-chunk window seam, and re-running a video is bitwise identical
    (north-star requirement);
  - a JSON resume manifest + per-chunk .npz outputs make long jobs
    resumable after failure (SURVEY.md §5 failure-detection row: the
    reference has nothing — job death loses all work);
  - cooperative cancel between chunks, matching the reference Worker
    protocol (videovanish.py:110-132).
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import numpy as np

from videovanish_tpu.core.prog import check_cancel, null_prog, scale_prog
from videovanish_tpu.video.io import probe_video
from videovanish_tpu.video.staging import PrefetchingFrameSource


def _chunk_plan(total: int, chunk: int, overlap: int):
    """List of (start, end) half-open chunk windows, `overlap` shared
    between neighbors. Every chunk is EXACTLY `chunk` frames when
    total > chunk (the tail window snaps back, widening its overlap):
    a differently-sized last chunk would recompile the whole
    prior+diffusion stack (~minutes through the remote compiler)."""
    if total <= chunk:
        return [(0, total)]
    stride = chunk - overlap
    plan = []
    s = 0
    while True:
        if s + chunk >= total:
            plan.append((total - chunk, total))
            break
        plan.append((s, s + chunk))
        s += stride
    return plan


def _pair_overlaps(plan):
    """overlaps[i] = frames chunk i shares with chunk i-1 (0 for i=0)."""
    return [0] + [plan[i - 1][1] - plan[i][0] for i in range(1, len(plan))]


def vanish_video_chunked(color_video: str, mask_video: str, out_video: str,
                         start_frame: int = 0, max_frames: int = -1,
                         chunk_frames: Optional[int] = None,
                         overlap_frames: Optional[int] = None,
                         mask_dilation_iter: int = 8,
                         max_img_size: int = 960,
                         keep_unmasked_original: bool = True,
                         feather_px: int = 3,
                         prog=None, is_canceled=None,
                         resume: bool = True,
                         work_dir: Optional[str] = None) -> str:
    """Stream color+mask videos through the inpainting pipeline in
    overlapped chunks; write FFV1 output; resumable via manifest."""
    from videovanish_tpu.pipeline.infill import _get_config, run_infill_on_frames

    prog = prog or null_prog
    cfg = _get_config().chunking
    chunk = chunk_frames or cfg.chunk_frames
    overlap = overlap_frames if overlap_frames is not None \
        else cfg.overlap_frames
    overlap = min(overlap, chunk - 1)

    n_total, fps, H0, W0 = probe_video(color_video)
    if start_frame > 0:
        n_total = max(0, n_total - start_frame)
    if max_frames > 0:
        n_total = min(n_total, max_frames)
    assert n_total > 0, "No frames to process"

    plan = _chunk_plan(n_total, chunk, overlap)
    pair_ov = _pair_overlaps(plan)

    # fmt2 = latent-carry work-dir format (chunk npz carries carry_z /
    # carry_w, frames exclude the withheld tail). Versioning the job id
    # makes manifests from older formats non-resumable instead of
    # crashing on missing npz keys / duplicating seam frames.
    job_id = hashlib.sha1(
        f"fmt2|{os.path.abspath(color_video)}|{os.path.abspath(mask_video)}|"
        f"{start_frame}|{max_frames}|{chunk}|{overlap}|{mask_dilation_iter}|"
        f"{max_img_size}|{keep_unmasked_original}|{feather_px}".encode()
    ).hexdigest()[:16]
    wd = work_dir or (os.path.splitext(out_video)[0] + f".vvwork_{job_id}")
    os.makedirs(wd, exist_ok=True)
    manifest_path = os.path.join(wd, "manifest.json")

    manifest = {"job_id": job_id, "chunks": len(plan), "completed": []}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("job_id") == job_id:
            manifest = old

    # decode-ahead threads through the native ring buffer: codec I/O
    # overlaps device compute (video/staging.py)
    color_rd = PrefetchingFrameSource(color_video, start_frame, max_frames,
                                      prefetch_frames=chunk + overlap)
    mask_rd = PrefetchingFrameSource(mask_video, start_frame, max_frames,
                                     prefetch_frames=chunk + overlap)
    pos = 0  # current decode position in both readers
    # frame carry: overlap frames read for chunk i reused by chunk i+1
    carry_c: list = []
    carry_m: list = []
    chunk_data: dict = {}  # ci -> (frames, masks), memoized in order

    def materialize(ci):
        """Read (or return the memoized) frame/mask lists for chunk ci.
        MUST be reached in increasing-ci order (reader is sequential);
        the prepare thread below only ever asks for the chunk after the
        one the main loop is on, so this invariant holds."""
        nonlocal pos, carry_c, carry_m
        if ci in chunk_data:
            return chunk_data[ci]
        e = plan[ci][1]
        ovn = pair_ov[ci + 1] if ci < len(plan) - 1 else 0
        need = e - pos
        if need > 0:
            new_c = color_rd.read_chunk(need)
            new_m = mask_rd.read_chunk(need)
            pos += len(new_c)
        else:
            new_c, new_m = [], []
        frames = carry_c + new_c
        masks = carry_m + new_m
        # keep the tail overlap for the next chunk (the last pair's
        # overlap can exceed `overlap` when the tail window snaps)
        if ci < len(plan) - 1:
            carry_c = frames[-ovn:] if ovn else []
            carry_m = masks[-ovn:] if ovn else []
        chunk_data[ci] = (frames, masks)
        if ci - 1 in chunk_data:  # chunk i-1's frames are no longer needed
            del chunk_data[ci - 1]
        return chunk_data[ci]

    # Two single-worker pools pipeline the host/device seams:
    #   prep: at run_infill's device-idle point (denoise fetched, host
    #     composite ahead) chunk N+1's read+dilate+ProPainter prior is
    #     DISPATCHED, so the chip works through chunk N's composite+save
    #     (VERDICT r2: nothing overlapped the prior with denoise);
    #   io: npz compression + manifest update of chunk N runs behind
    #     chunk N+1's device work (zlib on 105 MB of 720p frames is
    #     seconds of pure host time on this class of machine).
    from concurrent.futures import ThreadPoolExecutor
    prep_pool = ThreadPoolExecutor(max_workers=1,
                                   thread_name_prefix="vv-prep")
    io_pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="vv-io")
    save_futs = []
    prep_fut = None  # Future[(ci, dilated_np, prior_dev)] | None

    def save_chunk(ci, out_list, carry, chunk_npz):
        if carry is not None:
            np.savez_compressed(chunk_npz, frames=np.stack(out_list),
                                carry_z=np.asarray(carry[0]),
                                carry_w=np.asarray(carry[1]))
        else:
            np.savez_compressed(chunk_npz, frames=np.stack(out_list))
        manifest["completed"] = sorted(set(manifest["completed"]) | {ci})
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)

    latent_carry = None  # (z_acc, w_acc) handed chunk -> chunk
    try:
        for ci, (s, e) in enumerate(plan):
            check_cancel(is_canceled)
            chunk_npz = os.path.join(wd, f"chunk_{ci:05d}.npz")
            ov_next = pair_ov[ci + 1] if ci < len(plan) - 1 else 0

            prepared = None
            if prep_fut is not None:
                pci, p_dil, p_prior = prep_fut.result()
                prep_fut = None
                if pci == ci:
                    prepared = (p_dil, p_prior)
            frames, masks = materialize(ci)

            if ci in manifest["completed"] and os.path.exists(chunk_npz):
                prog(5 + 85 * (ci + 1) / len(plan),
                     f"chunk {ci + 1}/{len(plan)} (resumed)")
                if ov_next:  # reload the latent carry for the next chunk
                    with np.load(chunk_npz) as z:
                        latent_carry = (z["carry_z"], z["carry_w"])
                else:
                    latent_carry = None
                continue

            def on_device_idle(next_ci=ci + 1):
                nonlocal prep_fut
                if next_ci >= len(plan):
                    return
                if next_ci in manifest["completed"] and os.path.exists(
                        os.path.join(wd, f"chunk_{next_ci:05d}.npz")):
                    return  # resumed chunk: nothing to prepare
                if is_canceled is not None and is_canceled():
                    return

                def task():
                    from videovanish_tpu.pipeline.infill import compute_prior
                    f, m = materialize(next_ci)
                    d_np, prior = compute_prior(
                        f, m, mask_dilation_iter=mask_dilation_iter)
                    return next_ci, d_np, prior

                prep_fut = prep_pool.submit(task)

            sub_prog = scale_prog(prog, 5 + 85 * ci / len(plan),
                                  5 + 85 * (ci + 1) / len(plan),
                                  prefix=f"[chunk {ci + 1}/{len(plan)}] ")
            out = run_infill_on_frames(
                frames, masks, mask_dilation_iter=mask_dilation_iter,
                max_img_size=max_img_size,
                keep_unmasked_original=keep_unmasked_original,
                feather_px=feather_px, prog=sub_prog,
                frame_offset=s, latent_carry=latent_carry,
                return_latent_tail=ov_next,
                dilated_masks=prepared[0] if prepared else None,
                propainer_frames=prepared[1] if prepared else None,
                on_device_idle=on_device_idle)
            if ov_next:
                out, latent_carry = out
            else:
                latent_carry = None
            save_futs.append(io_pool.submit(
                save_chunk, ci, out, latent_carry if ov_next else None,
                chunk_npz))
        for f in save_futs:  # surface writer-thread failures
            f.result()
    finally:
        if prep_fut is not None:  # don't leave device work dangling
            try:
                prep_fut.result()
            except Exception:
                pass
        prep_pool.shutdown(wait=True)
        io_pool.shutdown(wait=True)
        color_rd.close()
        mask_rd.close()

    # ---- assemble: every chunk's frames are already final (seams were
    # blended in latent space via the carry), stream-write in order
    prog(92, "assembling output")
    import cv2
    writer = cv2.VideoWriter(str(out_video), cv2.VideoWriter_fourcc(*"FFV1"),
                             fps, (W0, H0))
    assert writer.isOpened(), "Failed to open VideoWriter (FFV1/MKV)."
    n_written = 0
    for ci in range(len(plan)):
        with np.load(os.path.join(wd, f"chunk_{ci:05d}.npz")) as z:
            cur = z["frames"]
        for f in cur:
            writer.write(cv2.cvtColor(np.ascontiguousarray(f),
                                      cv2.COLOR_RGB2BGR))
            n_written += 1
    writer.release()
    print(f"[ok] wrote {n_written} frames to {out_video}")

    # success: clear the work dir
    for fn in os.listdir(wd):
        os.remove(os.path.join(wd, fn))
    os.rmdir(wd)
    prog(100, "done")
    return out_video
