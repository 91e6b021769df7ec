#!/usr/bin/env bash
# Launch the VideoVanish GUI (reference counterpart: start_videovanish.bat).
cd "$(dirname "$0")"
exec python videovanish.py "$@"
