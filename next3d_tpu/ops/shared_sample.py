"""Bilinear sampling of one SHARED single-channel image without a gather.

Reference behavior: torch ``F.grid_sample`` on the broadcast eye-mask
texture (training_avatar_texture/triplane_next3d.py:213-214; mask loaded at
:91-92) — align_corners=False, zeros padding, bilinear.

Why not ``grid_sample_2d``: TPU gathers pay a per-ROW issue-rate floor
(~11.5 ns/row, docs/STAGE_PROFILE.md) regardless of row width, so a
1-channel lookup at 2.1M points costs the same ~24 ms as the 32-channel
texture gather it used to ride along with — and riding along pushed the
packed row to 4*33 = 132 bf16 channels = 264 B, past the 256 B lane
boundary. Here the lookup is instead expressed as a SEPARABLE ONE-HOT
CONTRACTION: out[p] = Wy[p,:] @ img @ Wx[p,:]^T with Wx/Wy the per-axis
bilinear weights (two non-zeros per row, built by iota comparison). XLA
fuses the weight generation into the matmul operands, the MXU does the
FLOPs (~P*W*H MACs: ~0.3 TFLOP at P=2.1M, H=W=256 — a few ms), and no
per-row gather is issued. Out-of-bounds taps get zero weight because an
iota index never equals an out-of-range tap index — exactly grid_sample's
zeros padding.

Only worthwhile for 1 (or very few) channels of a batch-shared image: the
first contraction scales linearly in channels, so the 32-channel texture
itself stays on the packed-gather path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_shared(img, grid, chunk=1 << 18):
    """Sample a shared (H, W) image at ``grid`` points.

    Args:
      img: (H, W) single-channel image, shared across the whole batch.
      grid: (..., 2) normalized (x, y) in [-1, 1]; align_corners=False,
        padding_mode='zeros', mode='bilinear' (torch F.grid_sample
        defaults, matching ops.grid_sample_2d).
      chunk: points per contraction step — bounds the (chunk, W) one-hot
        operand if XLA materializes it, and keeps each matmul MXU-sized.

    Returns:
      grid.shape[:-1] array of samples, in img.dtype.
    """
    H, W = img.shape
    out_shape = grid.shape[:-1]
    pts = grid.reshape(-1, 2)
    P = pts.shape[0]

    # f32 coordinate math regardless of image dtype (same policy as
    # grid_sample_2d: bf16 coordinate math has ~1px ulp near the far edge).
    x = (pts[:, 0].astype(jnp.float32) + 1) * (W / 2) - 0.5
    y = (pts[:, 1].astype(jnp.float32) + 1) * (H / 2) - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    cdt = img.dtype
    imgT = img.T.astype(cdt)  # (W, H) so T = Wx @ imgT contracts over W
    pad = (-P) % chunk
    steps = (P + pad) // chunk

    def pad_to(a):
        return jnp.pad(a, (0, pad)).reshape(steps, chunk)

    iw = jnp.arange(W, dtype=jnp.int32)
    ih = jnp.arange(H, dtype=jnp.int32)

    def step(args):
        x0c, y0c, wx1c, wy1c = args
        Wx = ((iw == x0c[:, None]) * (1 - wx1c)[:, None]
              + (iw == x0c[:, None] + 1) * wx1c[:, None]).astype(cdt)
        T = jnp.matmul(Wx, imgT, precision=jax.lax.Precision.HIGHEST)
        Wy = ((ih == y0c[:, None]) * (1 - wy1c)[:, None]
              + (ih == y0c[:, None] + 1) * wy1c[:, None]).astype(cdt)
        return jnp.sum(T * Wy, axis=-1, dtype=jnp.float32).astype(cdt)

    if steps <= 1:
        out = step((x0, y0, wx1, wy1))[:P]
    else:
        out = jax.lax.map(step, (pad_to(x0), pad_to(y0),
                                 pad_to(wx1), pad_to(wy1)))
        out = out.reshape(-1)[:P]
    return out.reshape(out_shape)
