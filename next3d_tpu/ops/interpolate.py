"""torch.nn.functional.interpolate-compatible resizing primitives.

The reference leans on three distinct resize semantics:
  * bilinear, align_corners=False, antialias=False  — e.g. filtered_resizing
    'none' mode (dual_discriminator.py:94), ADA raw-branch resize.
  * bilinear, align_corners=False, antialias=True   — the raw-image target
    downsample (dual_discriminator.py:88), SR input resize
    (superresolution.py:283-286), mouth crop/paste (triplane_next3d.py:152,161).
  * nearest — the eye-mask resize (triplane_next3d.py:92).

All are implemented as separable weighted gathers with static tap counts so
they stay jit-compatible even when the *source window* is dynamic (the mouth
crop/paste path uses ``resample_region`` below).

Precision policy: the weighted-sum einsums run at HIGHEST precision for
float32 inputs (parity paths — fp32 math must not silently become one-pass
bf16 on TPU) and at the native one-pass precision for reduced-precision
inputs (the flagship's force_fp32=False mode feeds these ops bfloat16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _prec(x):
    return (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _contributions_1d(in_size: int, out_size: int, antialias: bool):
    """Per-output-pixel source indices and weights for torch bilinear resize.

    Matches torch's upsample_bilinear2d(align_corners=False) for
    antialias=False and _upsample_bilinear2d_aa (triangle kernel, PIL-style)
    for antialias=True. Returns (idx (out, taps) int32, w (out, taps) f32).
    """
    # static-shape index/weight tables: computed on host in float64
    import numpy as np
    scale = in_size / out_size
    # source center for each output pixel (half-pixel convention)
    out_coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    support = max(scale, 1.0) if antialias else 1.0
    filterscale = max(scale, 1.0) if antialias else 1.0
    taps = int(2 * support) + 2

    left = np.floor(out_coords - support).astype(np.int32) + 1
    k = np.arange(taps, dtype=np.int32)[None, :]
    idx = left[:, None] + k  # (out, taps)
    dist = (idx.astype(np.float64) - out_coords[:, None]) / filterscale
    w = np.maximum(0.0, 1.0 - np.abs(dist))  # triangle kernel
    if antialias:
        # torch/PIL drop out-of-range taps and renormalize over the rest
        w = np.where((idx >= 0) & (idx < in_size), w, 0.0)
    # (for antialias=False, clamping indices reproduces torch's source-index
    # clamp at the borders; the weights already sum to 1)
    idx = np.clip(idx, 0, in_size - 1)
    w = w / np.sum(w, axis=1, keepdims=True)
    return jnp.asarray(idx), jnp.asarray(w.astype(np.float32))


def interpolate_bilinear(x, size, antialias=False):
    """F.interpolate(x, size, mode='bilinear', align_corners=False, antialias=...).

    x: (..., H, W) -> (..., size[0], size[1]). Static sizes only.
    """
    if isinstance(size, int):
        size = (size, size)
    Ho, Wo = size
    H, W = x.shape[-2], x.shape[-1]
    if (H, W) == (Ho, Wo):
        return x

    idx_y, w_y = _contributions_1d(H, Ho, antialias)
    idx_x, w_x = _contributions_1d(W, Wo, antialias)
    w_y = w_y.astype(x.dtype)
    w_x = w_x.astype(x.dtype)

    # rows: gather (..., Ho, taps, W) then weight-sum over taps
    xr = jnp.take(x, idx_y.reshape(-1), axis=-2)
    xr = xr.reshape(x.shape[:-2] + (Ho, idx_y.shape[1], W))
    xr = jnp.einsum('...htw,ht->...hw', xr, w_y, precision=_prec(xr))
    # cols
    xc = jnp.take(xr, idx_x.reshape(-1), axis=-1)
    xc = xc.reshape(xr.shape[:-1] + (Wo, idx_x.shape[1]))
    out = jnp.einsum('...wt,wt->...w', xc, w_x, precision=_prec(xr))
    return out


def interpolate_nearest(x, size):
    """F.interpolate(x, size) default mode='nearest'. x: (..., H, W)."""
    if isinstance(size, int):
        size = (size, size)
    Ho, Wo = size
    H, W = x.shape[-2], x.shape[-1]
    # torch nearest: src = floor(dst * in/out)
    iy = jnp.minimum((jnp.arange(Ho) * (H / Ho)).astype(jnp.int32), H - 1)
    ix = jnp.minimum((jnp.arange(Wo) * (W / Wo)).astype(jnp.int32), W - 1)
    return jnp.take(jnp.take(x, iy, axis=-2), ix, axis=-1)


def resample_region(src, start_y, start_x, size_y, size_x, out_h, out_w,
                    taps=16):
    """Antialiased bilinear resample of a DYNAMIC window of ``src`` onto a
    static (out_h, out_w) grid.

    Equivalent to ``F.interpolate(src[:, sy:sy+szy, sx:sx+szx],
    (out_h, out_w), mode='bilinear', antialias=True)`` but with static shapes:
    the dynamic crop is folded into the sampling positions. Used for the
    mouth crop (triplane_next3d.py:151-152).

    Args:
      src: (C, H, W).
      start_y/start_x/size_y/size_x: scalar int32 (traced OK).
      taps: static kernel support; must satisfy taps >= 2*ceil(scale)+2
        where scale = size/out. taps=16 covers scale <= 7.

    Out-of-window taps are clamped to the window (replicate-edge), matching
    torch's boundary handling of the cropped tensor.
    """
    C, H, W = src.shape

    def axis_samples(start, sz, out_size, in_limit):
        scale = sz.astype(jnp.float32) / out_size
        support = jnp.maximum(scale, 1.0)
        centers = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        left = jnp.floor(centers - support).astype(jnp.int32) + 1
        k = jnp.arange(taps, dtype=jnp.int32)[None, :]
        idx = left[:, None] + k
        dist = (idx.astype(jnp.float32) - centers[:, None]) / support
        w = jnp.maximum(0.0, 1.0 - jnp.abs(dist))
        # drop taps outside the window (torch/PIL boundary), renormalize,
        # then shift into src coords and clamp to src bounds
        w = jnp.where((idx >= 0) & (idx < sz), w, 0.0)
        idx = jnp.clip(idx, 0, sz - 1) + start
        idx = jnp.clip(idx, 0, in_limit - 1)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        return idx, w.astype(src.dtype)

    idx_y, w_y = axis_samples(start_y, size_y, out_h, H)
    idx_x, w_x = axis_samples(start_x, size_x, out_w, W)

    xr = src[:, idx_y.reshape(-1), :].reshape(C, out_h, taps, W)
    xr = jnp.einsum('chtw,ht->chw', xr, w_y, precision=_prec(xr))
    xc = xr[:, :, idx_x.reshape(-1)].reshape(C, out_h, out_w, taps)
    return jnp.einsum('chwt,wt->chw', xc, w_x, precision=_prec(xr))


def paste_resized_region(canvas, patch, start_y, start_x, size_y, size_x,
                         taps=32):
    """Paste ``patch`` resized to a DYNAMIC (size_y, size_x) window into
    ``canvas`` at (start_y, start_x); the rest of the canvas is untouched.

    Equivalent to ``canvas[:, sy:sy+szy, sx:sx+szx] =
    F.interpolate(patch, (szy, szx), mode='bilinear', antialias=True)``
    (triplane_next3d.py:156-163) with static shapes: every canvas pixel
    computes its source position in ``patch`` coords and samples with a
    triangle kernel; a mask selects window pixels.

    Args:
      canvas: (C, H, W); patch: (C, Ph, Pw).
      taps: static support; covers downscale factors up to ~taps/2 - 1
        (patch 256 -> window >= ~18 px with the default).
    """
    C, H, W = canvas.shape
    _, Ph, Pw = patch.shape

    def axis(out_positions, start, sz, in_size):
        # position of each canvas pixel inside the window, in patch coords
        rel = out_positions - start  # (H,) canvas-space offset into window
        scale = in_size / sz.astype(jnp.float32)  # patch pixels per window px
        centers = (rel.astype(jnp.float32) + 0.5) * scale - 0.5
        support = jnp.maximum(scale, 1.0)
        left = jnp.floor(centers - support).astype(jnp.int32) + 1
        k = jnp.arange(taps, dtype=jnp.int32)[None, :]
        idx = left[:, None] + k
        dist = (idx.astype(jnp.float32) - centers[:, None]) / support
        w = jnp.maximum(0.0, 1.0 - jnp.abs(dist))
        inside = (rel >= 0) & (rel < sz)
        # drop taps outside the patch (torch/PIL boundary), renormalize
        w = jnp.where((idx >= 0) & (idx < in_size), w, 0.0)
        idx = jnp.clip(idx, 0, in_size - 1)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        return idx, w.astype(canvas.dtype), inside

    ys = jnp.arange(H, dtype=jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)
    idx_y, w_y, in_y = axis(ys, start_y, size_y, Ph)
    idx_x, w_x, in_x = axis(xs, start_x, size_x, Pw)

    pr = patch[:, idx_y.reshape(-1), :].reshape(C, H, taps, Pw)
    pr = jnp.einsum('chtw,ht->chw', pr, w_y, precision=_prec(pr))
    pc = pr[:, :, idx_x.reshape(-1)].reshape(C, H, W, taps)
    resized = jnp.einsum('chwt,wt->chw', pc, w_x, precision=_prec(pc))

    mask = (in_y[:, None] & in_x[None, :]).astype(canvas.dtype)[None]
    return canvas * (1 - mask) + resized * mask
