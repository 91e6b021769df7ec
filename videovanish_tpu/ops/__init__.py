from videovanish_tpu.ops.morphology import binary_dilation
from videovanish_tpu.ops.edt import chamfer_distance
from videovanish_tpu.ops.composite import feathered_composite
from videovanish_tpu.ops.resize import resize_bilinear, resize_nearest
from videovanish_tpu.ops.attention import attention
from videovanish_tpu.ops.groupnorm import group_norm, group_norm_silu

__all__ = [
    "binary_dilation",
    "chamfer_distance",
    "feathered_composite",
    "resize_bilinear",
    "resize_nearest",
    "attention",
    "group_norm",
    "group_norm_silu",
]
