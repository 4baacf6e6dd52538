from .resize import (
    interp_matrix_align_corners,
    adaptive_pool_matrix,
    upsample_bilinear_ac,
    resize_nearest,
    adaptive_avg_pool,
)
from .losses import (
    weighted_cross_entropy,
    cross_entropy,
    class_balance_weights,
    weighted_dice_loss,
    smoothed_cross_entropy,
    seg_loss,
)
from .metrics import (
    intersection_and_union,
    batch_intersection_and_union,
)

__all__ = [
    "interp_matrix_align_corners",
    "adaptive_pool_matrix",
    "upsample_bilinear_ac",
    "resize_nearest",
    "adaptive_avg_pool",
    "weighted_cross_entropy",
    "cross_entropy",
    "class_balance_weights",
    "weighted_dice_loss",
    "smoothed_cross_entropy",
    "seg_loss",
    "intersection_and_union",
    "batch_intersection_and_union",
]
