from videovanish_tpu.core.mesh import make_mesh, mesh_shape_for
from videovanish_tpu.core.precision import Policy, default_policy
from videovanish_tpu.core.prog import ProgressFn, null_prog, scale_prog

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "Policy",
    "default_policy",
    "ProgressFn",
    "null_prog",
    "scale_prog",
]
