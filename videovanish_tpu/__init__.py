"""videovanish_tpu — TPU-native video object removal.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
calledit/VideoVanish (see SURVEY.md): interactive SAM2 video masking and
diffusion-based video inpainting (BrushNet-conditioned SD1.5 UNet with
temporal attention, PCM 2-step sampling, ProPainter-style flow prior),
plus the same CLI surface (`sam2_masker`, `diffuerase`, `videovanish`).

Layering (bottom → top):
  core/      mesh + precision policy + weight conversion + checkpointing
  video/     host codec I/O edge (RGB in memory, FFV1/MKV out)
  ops/       Pallas/XLA kernels: flash attention, fused GN+SiLU, dilation,
             chamfer EDT feather/composite, resize, flow warp
  models/    sam2 / propainter / diffueraser — pure flax modules
  parallel/  mesh axes, sharding rules, temporal ring attention
  pipeline/  run_sam2_on_frames / run_infill_on_frames + chunked driver
  train/     sharded diffusion train step (dp/tp/sp over a Mesh)
  cli/       flag-for-flag entry points
  gui/       PySide6 app (import-gated; optional)
"""

__version__ = "0.1.0"
