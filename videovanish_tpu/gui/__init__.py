"""PySide6 GUI (optional). Import-gated: headless TPU hosts without
PySide6 use the CLI pipelines; `videovanish.py` degrades with a clear
message (cli/videovanish.py)."""
