#!/usr/bin/env bash
# Install videovanish-tpu (reference counterpart: install_videovanish.sh).
#
# Unlike the reference installer (conda env + torch + git-cloned model
# packages), everything here is one Python package; jax/flax/optax/orbax
# and OpenCV are expected to be preinstalled (TPU VM images ship them).
# PySide6 is optional (GUI only): pass --with-gui to attempt it.
#
# Component flags mirror the reference installer's
# --no-gui/--no-sam2/--no-diffu-eraser (install_videovanish.sh:13-16).
# Here all models live in one package, so the --no-* flags skip that
# component's post-install import check and weight-conversion reminder
# rather than skipping a separate package install.
set -euo pipefail

WITH_GUI=0
INSTALL_SAM2=1
INSTALL_DIFFUERASER=1

usage() {
  cat <<EOF
usage: ./install.sh [options]

Options:
  --with-gui         Also pip install PySide6 (GUI; default off on TPU VMs)
  --no-gui           Explicitly skip GUI packages (the default; parity
                     with the reference installer flag)
  --no-sam2          Skip the SAM2 component check (masking unavailable)
  --no-diffu-eraser  Skip the DiffuEraser/ProPainter component check
  -h, --help         Show this help
EOF
}

for arg in "$@"; do
  case "$arg" in
    --with-gui) WITH_GUI=1 ;;
    --no-gui) WITH_GUI=0 ;;
    --no-sam2) INSTALL_SAM2=0 ;;
    --no-diffu-eraser) INSTALL_DIFFUERASER=0 ;;
    -h|--help) usage; exit 0 ;;
    *) echo "Unknown option: $arg"; usage; exit 1 ;;
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

if [ "$INSTALL_SAM2" = "1" ]; then
  python -c "import videovanish_tpu.models.sam2, videovanish_tpu.pipeline.masker; \
print('[install] SAM2 component ok (convert weights: python -m videovanish_tpu.cli.convert sam2 ...)')"
else
  echo "[install] skipping SAM2 component (--no-sam2)"
fi

if [ "$INSTALL_DIFFUERASER" = "1" ]; then
  python -c "import videovanish_tpu.models.diffueraser, videovanish_tpu.models.propainter, \
videovanish_tpu.pipeline.infill; \
print('[install] DiffuEraser/ProPainter component ok (convert weights: python -m videovanish_tpu.cli.convert ...)')"
else
  echo "[install] skipping DiffuEraser component (--no-diffu-eraser)"
fi

if [ "$WITH_GUI" = "1" ]; then
  pip install PySide6 || echo "[install] PySide6 install failed; GUI disabled"
fi

echo "[install] done. Try: python diffuerase.py --help"
