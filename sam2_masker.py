#!/usr/bin/env python3
"""Repo-root shim: `python sam2_masker.py ...` works exactly like the
reference entry point (sam2_masker.py:183-209)."""
from videovanish_tpu.cli.sam2_masker import main

if __name__ == "__main__":
    main()
