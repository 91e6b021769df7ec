from videovanish_tpu.native.binding import (
    FrameRing, available, binary_dilate, chamfer_distance, feather_composite,
)

__all__ = ["FrameRing", "available", "binary_dilate", "chamfer_distance",
           "feather_composite"]
