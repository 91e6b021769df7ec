echo windows installer for videovanish-tpu
REM Reference counterpart: windows_install.bat (conda env + torch/CUDA +
REM git-cloned model packages). Here everything is one package; jax has
REM no Windows TPU wheels, so a Windows install runs the CPU backend —
REM fine for the GUI, annotation, mask preview and small clips. Point
REM VV_COORDINATOR at a TPU host for real inference, or run install.sh
REM on a TPU VM.

set "CONDA=%UserProfile%\miniconda3\condabin\conda.bat"

CALL "%CONDA%" tos accept --override-channels --channel https://repo.anaconda.com/pkgs/main
CALL "%CONDA%" tos accept --override-channels --channel https://repo.anaconda.com/pkgs/r
CALL "%CONDA%" tos accept --override-channels --channel https://repo.anaconda.com/pkgs/msys2

CALL "%CONDA%" create -n videovanish python=3.11 -y
CALL "%UserProfile%\miniconda3\Scripts\activate.bat" videovanish

pip install jax flax optax orbax-checkpoint chex einops
pip install numpy scipy opencv-python PySide6

REM weight conversion (core/convert.py) reads torch/safetensors checkpoints
pip install torch --index-url https://download.pytorch.org/whl/cpu
pip install safetensors

pip install -e . --no-deps --no-build-isolation

echo Installation done
pause
