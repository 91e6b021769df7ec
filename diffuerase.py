#!/usr/bin/env python3
"""Repo-root shim: `python diffuerase.py ...` works exactly like the
reference entry point (diffuerase.py:121-155)."""
from videovanish_tpu.cli.diffuerase import main

if __name__ == "__main__":
    main()
