#!/usr/bin/env bash
# Install videovanish-tpu (reference counterpart: install_videovanish.sh).
#
# Unlike the reference installer (conda env + torch + git-cloned model
# packages), everything here is one Python package; jax/flax/optax/orbax
# and OpenCV are expected to be preinstalled (TPU VM images ship them).
# PySide6 is optional (GUI only): pass --with-gui to attempt it.
set -euo pipefail

WITH_GUI=0
for arg in "$@"; do
  case "$arg" in
    --with-gui) WITH_GUI=1 ;;
    -h|--help)
      echo "usage: ./install.sh [--with-gui]"; exit 0 ;;
  esac
done

cd "$(dirname "$0")"

python - <<'EOF'
import importlib, sys
missing = [m for m in ("jax", "flax", "optax", "numpy", "cv2", "scipy")
           if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"missing required packages: {missing}; install a JAX TPU "
             f"image or `pip install jax[tpu] flax optax orbax-checkpoint "
             f"opencv-python scipy`")
print("[install] required packages present")
EOF

pip install -e . --no-deps --no-build-isolation

# build the native host library up front (also builds lazily on first use)
python -c "from videovanish_tpu import native; assert native.available(); \
print('[install] native library built')"

if [ "$WITH_GUI" = "1" ]; then
  pip install PySide6 || echo "[install] PySide6 install failed; GUI disabled"
fi

echo "[install] done. Try: python diffuerase.py --help"
