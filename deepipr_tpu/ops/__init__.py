"""TPU ops: norms, pooling, and Pallas kernels."""

from deepipr_tpu.ops.norms import apply_norm, make_norm
from deepipr_tpu.ops.pooling import adaptive_avg_pool2d, global_avg_pool, max_pool2d

__all__ = [
    "apply_norm",
    "make_norm",
    "adaptive_avg_pool2d",
    "global_avg_pool",
    "max_pool2d",
]
