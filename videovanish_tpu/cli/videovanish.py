"""CLI/GUI entry: videovanish — flag-for-flag with the reference
(videovanish.py:1744-1766). Launches the PySide6 GUI when available;
without PySide6 (headless TPU hosts) it degrades to a clear message
pointing at the CLI pipelines, instead of a stack trace."""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="VideoVanish — interactive video object removal.")
    ap.add_argument("--color_video", type=str, default=None,
                    help="Color video to open at startup.")
    ap.add_argument("--mask_video", type=str, default=None,
                    help="Mask video to open at startup.")
    ap.add_argument("--infilled_video", type=str, default=None,
                    help="Infilled video to open at startup.")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    try:
        from videovanish_tpu.gui.app import run_app
    except ImportError as e:
        print("[videovanish] GUI unavailable (PySide6 not installed): "
              f"{e}\n"
              "Use the CLI pipelines instead:\n"
              "  python sam2_masker.py --color_video ... --annotations ...\n"
              "  python diffuerase.py --color_video ... --mask_video ...",
              file=sys.stderr)
        sys.exit(2)
    sys.exit(run_app(color_video=args.color_video,
                     mask_video=args.mask_video,
                     infilled_video=args.infilled_video))


if __name__ == "__main__":
    main()
