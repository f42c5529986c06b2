"""On-device hole filling for the rasterized face alpha.

The reference calls OpenCV floodFill per image inside the training forward
pass (renderer.py:583-601) — a GPU->CPU round-trip. Semantics of that code:
every pixel NOT 4-connected-reachable from corner (0, 0) through pixels with
alpha*255 <= 254 is set to 1 (this closes the mouth interior, which FLAME
does not model); reachable pixels keep their alpha.

Here the flood fill runs on-device as iterated 4-neighbourhood dilation
masked by the fillable region — a short ``lax.scan`` of cheap stencil ops.
A multigrid schedule (coarse fill, upsample, refine) keeps the iteration
count low: connectivity is resolved at 1/4 resolution first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dilate4(m):
    """One 4-connected dilation step of a {0,1} mask (..., H, W)."""
    up = jnp.pad(m[..., 1:, :], [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])
    down = jnp.pad(m[..., :-1, :], [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])
    left = jnp.pad(m[..., :, 1:], [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])
    right = jnp.pad(m[..., :, :-1], [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])
    return jnp.maximum(m, jnp.maximum(jnp.maximum(up, down),
                                      jnp.maximum(left, right)))


def _flood_from_corner(fillable, iters):
    """Reachable set from pixel (0,0) through ``fillable`` (4-connectivity)."""
    seed = jnp.zeros_like(fillable)
    seed = seed.at[..., 0, 0].set(fillable[..., 0, 0])

    def step(m, _):
        return jnp.minimum(_dilate4(m), fillable), None

    out, _ = jax.lax.scan(step, seed, None, length=iters)
    return out


def fill_mouth(images, coarse_iters=96, refine_iters=24):
    """images: (B, 1, H, W) alpha in [0, 1] -> filled alpha.

    Matches the reference's floodFill semantics (renderer.py:583-601):
    alpha' = 1 on pixels unreachable from the corner, original alpha
    elsewhere. The fillable threshold alpha*255 <= 254 mirrors
    FLOODFILL_FIXED_RANGE with upDiff=254 from a 0-valued seed.
    """
    B, C, H, W = images.shape
    assert C == 1
    a = images[:, 0]
    fillable = (a * 255.0 <= 254.0).astype(a.dtype)

    # Coarse pass at 1/4 resolution. A coarse cell counts as fillable only if
    # ALL of its pixels are (min-pool): coarse reachability then UNDER-
    # approximates true reachability (any coarse path implies a fine path),
    # so the fine refinement below can only expand it toward the exact
    # answer — over-approximation could never be corrected.
    f4 = fillable.reshape(B, H // 4, 4, W // 4, 4).min(axis=(2, 4))
    r4 = _flood_from_corner(f4, coarse_iters)
    # upsample reachability and clip to the fine fillable set, then refine
    r = jnp.repeat(jnp.repeat(r4, 4, axis=1), 4, axis=2) * fillable
    # make sure the true seed is present
    r = r.at[:, 0, 0].set(fillable[:, 0, 0])

    def step(m, _):
        return jnp.minimum(_dilate4(m), fillable), None

    r, _ = jax.lax.scan(step, r, None, length=refine_iters)
    reachable = r > 0.5
    filled = jnp.where(reachable, a, jnp.ones_like(a))
    return filled[:, None]


def fill_mouth_exact(images, iters=None):
    """Single-resolution flood fill (exact; for validation)."""
    B, C, H, W = images.shape
    a = images[:, 0]
    fillable = (a * 255.0 <= 254.0).astype(a.dtype)
    if iters is None:
        iters = H + W
    reachable = _flood_from_corner(fillable, iters) > 0.5
    return jnp.where(reachable, a, jnp.ones_like(a))[:, None]
