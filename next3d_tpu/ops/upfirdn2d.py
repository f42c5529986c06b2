"""upfirdn2d: pad -> zero-insert upsample -> FIR filter -> downsample.

TPU-native implementation of the op family behind every StyleGAN2 resample
(reference semantics: torch_utils/ops/upfirdn2d.py:120-213 and the CUDA
kernels in upfirdn2d.cu). Instead of a hand-written gather kernel, the whole
pipeline maps onto ONE ``lax.conv_general_dilated`` call per pass:

  * zero-insertion upsampling  -> ``lhs_dilation``
  * padding / cropping         -> the (possibly negative) ``padding`` pairs
  * FIR filtering              -> a depthwise convolution
  * downsampling               -> ``window_strides``

which XLA tiles onto the TPU convolution units directly; gradients of any
order come from JAX autodiff (the reference needs a hand-mirrored backward,
upfirdn2d.py:253-271 — here that identity is a consequence of conv
transposition inside XLA).

Conventions match the reference exactly:
  * ``flip_filter=False`` means true convolution (filter flipped before the
    correlation the hardware performs).
  * separable (1-D) filters run as two passes, x-axis then y-axis, with the
    full ``gain`` applied via gain**(1/2) per pass.
  * torch's zero-insertion places N-1 zeros AFTER each sample; lhs_dilation
    places them BETWEEN samples, so the trailing (up-1) zeros are folded into
    the high-side padding.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def get_filter_size(f) -> tuple:
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a FIR filter for ``upfirdn2d`` (reference: upfirdn2d.py:72-116).

    Returns a float32 numpy array: 2-D (non-separable) or 1-D (separable).
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def _depthwise_conv(x, f2d, up, down, pad, precision):
    """One fused dilate/pad/filter/stride pass over NCHW ``x``.

    f2d: (fh, fw) array already flipped/gained as needed.
    up/down/pad are per-axis tuples: up=(upy, upx), pad=((py0,py1),(px0,px1)).
    """
    num_channels = x.shape[1]
    (upy, upx), (downy, downx) = up, down
    (py0, py1), (px0, px1) = pad
    # fold torch's trailing zero-insertion into high-side padding
    py1 = py1 + (upy - 1)
    px1 = px1 + (upx - 1)
    fh, fw = f2d.shape
    rhs = jnp.broadcast_to(f2d.astype(x.dtype)[None, None], (num_channels, 1, fh, fw))
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(downy, downx),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=num_channels,
        precision=precision,
    )


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1,
              precision=jax.lax.Precision.HIGHEST):
    """Reference semantics: torch_utils/ops/upfirdn2d.py:120-213.

    Args:
      x: (N, C, H, W).
      f: float32 filter, (fh, fw) non-separable, (taps,) separable, or None.
      up/down: int or (x, y) ints.
      padding: int, (x, y), or (x0, x1, y0, y1) — w.r.t. the upsampled image;
        negative = crop.
      flip_filter: False = convolution, True = correlation.
      gain: overall magnitude scaling.
    """
    assert x.ndim == 4
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)

    if f.ndim == 2:
        fk = f * (gain ** 1.0)
        if not flip_filter:
            fk = jnp.flip(fk, axis=(0, 1))
        return _depthwise_conv(
            x, fk,
            up=((upy, upx)), down=((downy, downx)),
            pad=((pady0, pady1), (padx0, padx1)),
            precision=precision)

    # separable: x-axis pass then y-axis pass (matches upfirdn2d.cu dispatch,
    # upfirdn2d.py:246-247)
    fk = f * (gain ** 0.5)
    if not flip_filter:
        fk = jnp.flip(fk, axis=(0,))
    x = _depthwise_conv(
        x, fk[None, :],
        up=((1, upx)), down=((1, downx)),
        pad=((0, 0), (padx0, padx1)),
        precision=precision)
    x = _depthwise_conv(
        x, fk[:, None],
        up=((upy, 1)), down=((downy, 1)),
        pad=((pady0, pady1), (0, 0)),
        precision=precision)
    return x


def filter2d(x, f, padding=0, flip_filter=False, gain=1, **kwargs):
    """Shape-preserving FIR filter (reference: upfirdn2d.py:279-311)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain, **kwargs)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1, **kwargs):
    """FIR upsampling (reference: upfirdn2d.py:315-350)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy, **kwargs)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1, **kwargs):
    """FIR downsampling (reference: upfirdn2d.py:354-389)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain, **kwargs)
