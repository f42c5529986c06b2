"""2-D convolution with optional FIR up/downsampling.

Reference semantics: torch_utils/ops/conv2d_resample.py:48-143. The
reference routes each (up, down, kernel) combination to the fastest CUDA
sequence; here every route lowers to ``lax.conv_general_dilated`` +
``upfirdn2d`` and XLA picks the schedule, so we keep only the mathematically
meaningful structure:

  up > 1   : zero-inserted (lhs-dilated) conv with the weight, then FIR
             smoothing with gain up**2 (equivalent to the reference's
             transpose-conv fast path, conv2d_resample.py:114-131)
  down > 1 : FIR pre-filter, then strided conv
             (reference fast path :107-111)
  else     : plain conv

Padding arithmetic (including the filter-size adjustments at :83-93) is kept
bit-identical because it defines output shapes and pixel phase.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .upfirdn2d import upfirdn2d, get_filter_size, _parse_padding


def _conv2d(x, w, stride=1, padding=(0, 0, 0, 0), groups=1, flip_weight=True,
            lhs_dilation=(1, 1), precision=jax.lax.Precision.HIGHEST):
    """Grouped NCHW conv. ``padding`` is (px0, px1, py0, py1) and may be
    negative (crop). ``flip_weight=True`` performs correlation (torch conv2d);
    False performs true convolution."""
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = jnp.flip(w, axis=(2, 3))
    px0, px1, py0, py1 = padding
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)),
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=precision,
    )


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False,
                    precision=jax.lax.Precision.HIGHEST):
    """Reference: conv2d_resample.py:48-143.

    Args:
      x: (N, C_in, H, W)
      w: (C_out, C_in // groups, kh, kw)
      f: FIR filter from ``setup_filter`` (or None = identity).
      padding: int / (x, y) / (x0, x1, y0, y1), w.r.t. the upsampled image.
    """
    assert x.ndim == 4 and w.ndim == 4
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding to account for up/downsampling (reference :83-93).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up == 1 and down == 1:
        return _conv2d(x, w, padding=(px0, px1, py0, py1), groups=groups,
                       flip_weight=flip_weight, precision=precision)

    if down > 1 and up == 1:
        # FIR pre-filter (no resampling), then strided conv (reference :107-111).
        if kw == 1 and kh == 1:
            # 1x1 fast path: downsample first, conv after (reference :96-99).
            x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                          flip_filter=flip_filter, precision=precision)
            return _conv2d(x, w, groups=groups, flip_weight=flip_weight,
                           precision=precision)
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter, precision=precision)
        return _conv2d(x, w, stride=down, groups=groups,
                       flip_weight=flip_weight, precision=precision)

    # up > 1 (optionally with down > 1)
    if kw == 1 and kh == 1 and down == 1:
        # 1x1 fast path: conv first, upsample after (reference :102-105).
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight,
                    precision=precision)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter,
                         precision=precision)

    # Zero-insert-upsampled convolution with the weight (== the reference's
    # transpose-conv fast path, :114-131), then FIR smoothing. The trailing
    # (up-1) inserted zeros of torch's upsampling convention are folded into
    # the FIR pass's high-side padding via the (kw - up) term below.
    cpx0 = px0 - (kw - 1)
    cpx1 = px1 - (kw - up)
    cpy0 = py0 - (kh - 1)
    cpy1 = py1 - (kh - up)
    # Split so the weight conv's implicit padding stays non-negative where
    # possible and the FIR pass absorbs the remainder — mirrors the
    # reference's pxt/pyt split (:125-128).
    pxt = max(min(-cpx0, -cpx1), 0)
    pyt = max(min(-cpy0, -cpy1), 0)
    x = _conv2d(x, w, padding=(kw - 1 - pxt, kw - 1 - pxt,
                               kh - 1 - pyt, kh - 1 - pyt),
                groups=groups, flip_weight=flip_weight,
                lhs_dilation=(up, up), precision=precision)
    x = upfirdn2d(x, f, padding=[cpx0 + pxt, cpx1 + pxt, cpy0 + pyt, cpy1 + pyt],
                  gain=up ** 2, flip_filter=flip_filter, precision=precision)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter,
                      precision=precision)
    return x
