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
from .upfirdn2d import _parse_padding, get_filter_size, upfirdn2d


def filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                   gain=math.sqrt(2), slope=0.2, clamp=None,
                   flip_filter=False):
    """x: (N, C, H, W); fu/fd: FIR filters from setup_filter."""
    fu_w, fu_h = get_filter_size(fu)
    fd_w, fd_h = get_filter_size(fd)
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += (fu_w + up - 1) // 2
    px1 += (fu_w - up) // 2
    py0 += (fu_h + up - 1) // 2
    py1 += (fu_h - up) // 2
    px0 += (fd_w - down + 1) // 2
    px1 += (fd_w - down) // 2
    py0 += (fd_h - down + 1) // 2
    py1 += (fd_h - down) // 2

    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, None, act='lrelu', alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
