from .fused_act import fused_bias_act, fused_leaky_relu
from .resample import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upsample_2d,
    upsample_conv_2d,
)
from .upfirdn2d import upfirdn2d, upfirdn2d_ref

__all__ = [
    "fused_bias_act",
    "fused_leaky_relu",
    "upfirdn2d",
    "upfirdn2d_ref",
    "setup_kernel",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
]
