"""Bilinear grid sampling (align_corners=False, zeros padding).

Reference usage: torch ``F.grid_sample`` inside tri-plane sampling
(training_avatar_texture/volumetric_rendering/renderer.py:62-72), UV texture
sampling (triplane_next3d.py:213,218) and the 2nd-order-differentiable
wrapper torch_utils/ops/grid_sample_gradfix.py:28-77.

On TPU this is a gather + lerp; JAX autodiff provides gradients of any order
(the scatter-add backward w.r.t. the input and the lerp-weight backward
w.r.t. the grid), which is exactly what grid_sample_gradfix hand-builds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(input, grid):
    """Sample ``input`` at normalized ``grid`` locations.

    Args:
      input: (N, C, H, W).
      grid: (N, Ho, Wo, 2) with (x, y) in [-1, 1]; align_corners=False,
        padding_mode='zeros', mode='bilinear' — torch F.grid_sample defaults
        as used by the reference.

    Returns:
      (N, C, Ho, Wo).
    """
    N, C, H, W = input.shape
    assert grid.shape[0] == N and grid.shape[-1] == 2
    Ho, Wo = grid.shape[1], grid.shape[2]

    x = (grid[..., 0].astype(input.dtype) + 1) * (W / 2) - 0.5
    y = (grid[..., 1].astype(input.dtype) + 1) * (H / 2) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1 - wx1
    wy0 = 1 - wy1
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    # TPU-friendly layout: gather ROWS of (H*W, C) — each lookup pulls a
    # contiguous C-vector (embedding-lookup pattern) instead of strided
    # per-channel element gathers from (C, H*W). Four separate per-corner
    # gathers, each fused with its weight multiply: a batched
    # all-corners-in-one-gather variant measured SLOWER end-to-end
    # (6.56 -> 6.05 img/s on the 512^2 bench) despite microbenches
    # suggesting otherwise — the materialized (N, 4*M, C) intermediate
    # costs more than the saved dispatches.
    feat = input.transpose(0, 2, 3, 1).reshape(N, H * W, C)

    def corner(xi, yi, wxi, wyi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        idx = idx.reshape(N, Ho * Wo)
        # take_along_axis lowers to the fast TPU gather path (~20x faster
        # than vmap(f[ix]) row indexing; see tools/profile_gather.py)
        g = jnp.take_along_axis(feat, idx[..., None], axis=1)  # (N, HoWo, C)
        wgt = (wxi * wyi * valid.astype(input.dtype)).reshape(N, Ho * Wo, 1)
        return g * wgt

    out = (corner(x0, y0, wx0, wy0) + corner(x1, y0, wx1, wy0)
           + corner(x0, y1, wx0, wy1) + corner(x1, y1, wx1, wy1))
    return out.reshape(N, Ho, Wo, C).transpose(0, 3, 1, 2)
