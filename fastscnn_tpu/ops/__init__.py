from fastscnn_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
)
from fastscnn_tpu.ops.pool import adaptive_avg_pool, avg_pool, max_pool
from fastscnn_tpu.ops.conv import (
    conv2d,
    conv2d_tapbwd,
    dw_conv2d_taps,
    batch_norm_apply,
    batch_norm_train,
    fold_conv_bn,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "adaptive_avg_pool",
    "avg_pool",
    "max_pool",
    "conv2d",
    "conv2d_tapbwd",
    "dw_conv2d_taps",
    "batch_norm_apply",
    "batch_norm_train",
    "fold_conv_bn",
]
