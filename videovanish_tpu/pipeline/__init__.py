from videovanish_tpu.pipeline.colors import color_for_obj
from videovanish_tpu.pipeline.infill import run_infill_on_frames
from videovanish_tpu.pipeline.masker import run_sam2_on_frames

__all__ = ["color_for_obj", "run_infill_on_frames", "run_sam2_on_frames"]
