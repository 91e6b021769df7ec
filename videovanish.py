#!/usr/bin/env python3
"""Repo-root shim: `python videovanish.py ...` works exactly like the
reference entry point (videovanish.py:1744-1766)."""
from videovanish_tpu.cli.videovanish import main

if __name__ == "__main__":
    main()
