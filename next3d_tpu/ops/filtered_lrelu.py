"""filtered_lrelu: up-FIR -> bias + leaky ReLU (+gain, clamp) -> down-FIR.

Behavioral spec: torch_utils/ops/filtered_lrelu.py:58-276 (reference
composition at :123-140; the 1.8k-line CUDA kernel exists to fuse these
three steps with a sign buffer for cheap backward). Used only by StyleGAN3
alias-free layers — OFF the released checkpoint's hot path (SURVEY 2.2) —
so the XLA composition is the implementation: the compiler fuses the
elementwise middle into the convolutions, and autodiff supplies the
backward that the sign-buffer trick hand-optimizes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn2d import _parse_padding, upfirdn2d


def filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                   gain=math.sqrt(2), slope=0.2, clamp=None,
                   flip_filter=False):
    """x: (N, C, H, W); fu/fd: FIR filters from setup_filter.

    ``padding`` is passed through to the upsampling pass VERBATIM
    (reference _filtered_lrelu_ref, filtered_lrelu.py:135-150): SG3 layers
    pre-compute the exact (often negative) padding that accounts for both
    filters' supports, so this op must NOT add its own filter-size
    adjustment. Output size:
    (in*up + px0+px1 - (fu-1) - (fd-1) + (down-1)) // down.
    """
    px0, px1, py0, py1 = _parse_padding(padding)
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, None, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
