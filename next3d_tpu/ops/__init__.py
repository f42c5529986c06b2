from .upfirdn2d import (
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from .bias_act import bias_act, activation_funcs
from .conv2d_resample import conv2d_resample
from .grid_sample import grid_sample_2d
from .interpolate import interpolate_bilinear
from .filtered_lrelu import filtered_lrelu


def fma(a, b, c):
    """a * b + c (reference torch_utils/ops/fma.py:17-60 exists only to
    cheapen torch grads; XLA fuses the multiply-add natively)."""
    return a * b + c
