"""CLI: diffusion inpainting — flag-for-flag with the reference
(diffuerase.py:121-155), including the default output name
`<input>_vanished.mkv`. The reference's inverted --prior_video condition
(SURVEY.md §2b#2: `if args.prior_video is None:` then loads it) is fixed
to the clear intent: load the prior only when one was supplied."""
from __future__ import annotations

import argparse
import os

from videovanish_tpu.pipeline.infill import run_infill_on_frames
from videovanish_tpu.video import (
    load_video_frames_from_path, write_video_frames_to_path,
)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Remove masked objects from a video "
                    "(flow prior + diffusion inpainting).")
    ap.add_argument("--color_video", required=True, type=str,
                    help="Input color video path.")
    ap.add_argument("--mask_video", required=True, type=str,
                    help="Input mask video path.")
    ap.add_argument("--prior_video", required=False, type=str,
                    help="Input prior video path.")
    ap.add_argument("--start_frame", type=int, default=0,
                    help="Index of first frame to process (default: 0).")
    ap.add_argument("--max_frames", type=int, default=-1,
                    help="Max number of frames to process after start_frame.")
    ap.add_argument("--out", type=str, default=None,
                    help="Output video path (default: <input>_vanished.mkv)")
    ap.add_argument("--max_img_size", type=int, default=960,
                    help="Inference resolution, long side (default: 960).")
    ap.add_argument("--mask_dilation_iter", type=int, default=8,
                    help="Mask dilation iterations (default: 8).")
    ap.add_argument("--chunked", choices=["auto", "on", "off"], default="auto",
                    help="Stream long videos through overlapped chunks with "
                         "resume support (auto: on for long videos when no "
                         "prior video is given).")
    return ap


def main(argv=None) -> None:
    from videovanish_tpu.core.runtime import (
    apply_env_distributed, apply_env_platform,
)
    apply_env_platform()
    apply_env_distributed()
    args = build_parser().parse_args(argv)
    assert os.path.isfile(args.color_video), "input video missing"
    out_video = args.out or (args.color_video + "_vanished.mkv")

    if args.chunked != "off" and args.prior_video is None:
        from videovanish_tpu.pipeline.chunking import vanish_video_chunked
        from videovanish_tpu.pipeline.infill import _get_config
        from videovanish_tpu.video.io import probe_video
        n, _, _, _ = probe_video(args.color_video)
        if args.max_frames > 0:
            n = min(n, args.max_frames)
        chunk = _get_config().chunking.chunk_frames
        if args.chunked == "on" or n > 2 * chunk:
            vanish_video_chunked(
                args.color_video, args.mask_video, out_video,
                start_frame=args.start_frame, max_frames=args.max_frames,
                mask_dilation_iter=args.mask_dilation_iter,
                max_img_size=args.max_img_size)
            return

    frames, fps = load_video_frames_from_path(
        args.color_video, args.start_frame, args.max_frames)
    H0, W0 = frames[0].shape[:2]

    mask_frames, _mask_fps = load_video_frames_from_path(
        args.mask_video, args.start_frame, args.max_frames)
    Hm, Wm = mask_frames[0].shape[:2]

    prior_frames = None
    if args.prior_video is not None:
        prior_frames, _ = load_video_frames_from_path(
            args.prior_video, args.start_frame, args.max_frames)
        Hp, Wp = prior_frames[0].shape[:2]
        assert (H0 == Hp and W0 == Wp), "prior and color video are diffrent sizes"

    assert (H0 == Hm and W0 == Wm), "mask and color video are diffrent sizes"

    out_frames = run_infill_on_frames(
        frames, mask_frames,
        mask_dilation_iter=args.mask_dilation_iter,
        propainer_frames=prior_frames,
        max_img_size=args.max_img_size,
    )
    write_video_frames_to_path(out_video, out_frames, fps, H0, W0)


if __name__ == "__main__":
    main()
