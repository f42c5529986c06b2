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

import os

import jax
import jax.numpy as jnp


@jax.custom_vjp
def grid_sample_2d(input, grid):
    """Sample ``input`` at normalized ``grid`` locations.

    Args:
      input: (N, C, H, W).
      grid: (N, Ho, Wo, 2) with (x, y) in [-1, 1]; align_corners=False,
        padding_mode='zeros', mode='bilinear' — torch F.grid_sample defaults
        as used by the reference.

    Returns:
      (N, C, Ho, Wo).

    custom_vjp: the forward may use the 2x2-packed fast gather (below); the
    backward always differentiates the lean per-corner formulation with
    only (input, grid) as residuals — otherwise the packed table (4x the
    input) and its pad/concat graph become autodiff residuals, which blew
    HBM on 512^2 training steps. Gradients are identical: both paths
    compute the same function. Higher-order grads (R1) flow through the
    per-corner path's own autodiff.
    """
    return _grid_sample_forward(input, grid)


def _grid_sample_forward(input, grid):
    N, C, H, W = input.shape
    assert grid.shape[0] == N and grid.shape[-1] == 2
    Ho, Wo = grid.shape[1], grid.shape[2]

    # Coordinate math ALWAYS in f32: with bf16 tables, (grid+1)*(W/2) in
    # bf16 has ulp ~1px near the high-coordinate edge — positional
    # quantization, not just feature precision (ADVICE r2). Only the
    # gathered rows stay in table dtype; weights are cast at multiply time.
    x = (grid[..., 0].astype(jnp.float32) + 1) * (W / 2) - 0.5
    y = (grid[..., 1].astype(jnp.float32) + 1) * (H / 2) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    # TPU-friendly layout: gather ROWS of (H*W, C) — each lookup pulls a
    # contiguous C-vector (embedding-lookup pattern) instead of strided
    # per-channel element gathers from (C, H*W). The TPU gather cost is
    # dominated by a per-ROW floor, so for large sample counts the four
    # bilinear taps are served by ONE gather from a 2x2-PACKED table
    # (row (y, x) holds the whole 2x2 neighborhood, 4C channels): 4x fewer
    # rows at ~4x width measured ~3.4x faster than 4 per-corner gathers on
    # v5e. (An all-corners-in-one-gather variant at 1C width measured
    # SLOWER end-to-end — the win comes from fewer rows, not fewer calls.)
    if N * Ho * Wo >= (1 << 16) and H >= 2 and W >= 2:
        return _grid_sample_packed(input, x0, y0, wx1, wy1, Ho, Wo)
    return _grid_sample_small(input, grid)


def _grid_sample_small(input, grid):
    """Per-corner formulation — also the graph the custom backward
    differentiates (lean residuals: no packed table)."""
    N, C, H, W = input.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    # f32 coordinate math regardless of table dtype (see _grid_sample_forward)
    x = (grid[..., 0].astype(jnp.float32) + 1) * (W / 2) - 0.5
    y = (grid[..., 1].astype(jnp.float32) + 1) * (H / 2) - 0.5
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
    feat = input.transpose(0, 2, 3, 1).reshape(N, H * W, C)

    def corner(xi, yi, wxi, wyi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        idx = idx.reshape(N, Ho * Wo)
        # take_along_axis lowers to the fast TPU gather path (~20x faster
        # than vmap(f[ix]) row indexing; see tools/profile_gather.py)
        g = jnp.take_along_axis(feat, idx[..., None], axis=1)  # (N, HoWo, C)
        # weight product in f32, single cast to table dtype at the multiply
        wgt = (wxi * wyi * valid).astype(input.dtype).reshape(N, Ho * Wo, 1)
        return g * wgt

    out = (corner(x0, y0, wx0, wy0) + corner(x1, y0, wx1, wy0)
           + corner(x0, y1, wx0, wy1) + corner(x1, y1, wx1, wy1))
    return out.reshape(N, Ho, Wo, C).transpose(0, 3, 1, 2)


def _grid_sample_fwd(input, grid):
    return _grid_sample_forward(input, grid), (input, grid)


def _use_scatter_free_bwd():
    """TPU only, by default: XLA serializes colliding-index scatters on TPU
    (~1.3 us/row) but handles them fine on CPU/GPU, where the sort+scan
    replacement is strictly slower. Trace-time backend switch; override
    with NEXT3D_SCATTER_FREE_BWD=0/1 (tests force 1 on CPU)."""
    env = os.environ.get('NEXT3D_SCATTER_FREE_BWD')
    if env is not None:
        return env not in ('0', '', 'false')
    return jax.default_backend() not in ('cpu', 'gpu', 'cuda', 'rocm')


def _grid_sample_bwd(res, ct):
    """Hand-rolled backward: the autodiff VJP of any gather formulation is
    a scatter-add with colliding indices, which XLA serializes on TPU
    (~1.3 us/row — 515 ms for one 393k-row corner stream; the round-4
    train step spent ~100 s/step in these). d(input) is instead computed
    scatter-free via ops.scatter_add.scatter_add_rows (sort + cumsum +
    gather) on the 2x2-packed update stream; d(grid) reuses autodiff of
    the packed formulation w.r.t. the fractional weights only (the table
    is stop_gradient'd, so no scatter appears)."""
    input, grid = res
    N, C, H, W = input.shape
    if H < 2 or W < 2 or not _use_scatter_free_bwd():
        _, vjp = jax.vjp(_grid_sample_small, input, grid)
        return vjp(ct)
    return _grid_sample_packed_bwd(input, grid, ct)


grid_sample_2d.defvjp(_grid_sample_fwd, _grid_sample_bwd)


def _grid_sample_packed_bwd(input, grid, ct):
    from .scatter_add import scatter_add_rows_batched

    N, C, H, W = input.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    x = (grid[..., 0].astype(jnp.float32) + 1) * (W / 2) - 0.5
    y = (grid[..., 1].astype(jnp.float32) + 1) * (H / 2) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    wx0 = 1 - wx1
    wy0 = 1 - wy1

    def axis_w(b, t0, w0, w1, d):
        return w0 * (b + d == t0) + w1 * (b + d == t0 + 1)

    # d(input): one packed update stream — slot (dy, dx) of table row
    # (by, bx) receives weight_slot * ct — summed by destination row
    # scatter-free, then the 4 slots fold back onto input with shifts
    # (the adjoint of the pad/concat packing in _grid_sample_packed).
    ct_rows = ct.transpose(0, 2, 3, 1).reshape(N, Ho * Wo, C)
    upd = jnp.concatenate(
        [ct_rows * (axis_w(by, y0, wy0, wy1, dy)
                    * axis_w(bx, x0, wx0, wx1, dx)).astype(ct.dtype).reshape(
                        N, Ho * Wo, 1)
         for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))], axis=-1)
    # batched (per-image sort/scan, ops/scatter_add.py): stays shard-local
    # under a data-parallel mesh — a batch-flattened stream would force a
    # cross-device distributed sort
    idx = (by * W + bx).reshape(N, Ho * Wo)
    dflat = scatter_add_rows_batched(H * W, idx, upd)
    d4 = dflat.reshape(N, H, W, 4, C)
    dinp = d4[..., 0, :]
    dinp = dinp + jnp.pad(d4[:, :, :-1, 1, :],
                          ((0, 0), (0, 0), (1, 0), (0, 0)))
    dinp = dinp + jnp.pad(d4[:, :-1, :, 2, :],
                          ((0, 0), (1, 0), (0, 0), (0, 0)))
    dinp = dinp + jnp.pad(d4[:, :-1, :-1, 3, :],
                          ((0, 0), (1, 0), (1, 0), (0, 0)))
    dinput = dinp.transpose(0, 3, 1, 2).astype(input.dtype)

    # d(grid): differentiate the packed formulation w.r.t. the fractional
    # weights only (integer taps and the gather have zero grad a.e.);
    # chain rule back through x = (gx + 1) * W/2 - 0.5.
    frozen = jax.lax.stop_gradient(input)

    def from_w(wx1_, wy1_):
        return _grid_sample_packed(frozen, x0, y0, wx1_, wy1_, Ho, Wo)

    _, vjp_w = jax.vjp(from_w, wx1, wy1)
    dwx1, dwy1 = vjp_w(ct)
    dgrid = jnp.stack([dwx1 * (W / 2), dwy1 * (H / 2)],
                      axis=-1).astype(grid.dtype)
    return dinput, dgrid


def _grid_sample_packed(input, x0, y0, wx1, wy1, Ho, Wo):
    """One-gather bilinear: rows of a 2x2-packed (H*W, 4C) table.

    The base index is clipped to [0, H-2]x[0, W-2] so the packed 2x2
    neighborhood is always in-bounds; each packed slot (dy, dx) receives
    the weight of whichever tap (y0+ty, x0+tx) coincides with
    (base+dy, base+dx) — zero when none does, which reproduces
    grid_sample's zeros padding exactly (out-of-image taps never coincide
    with an in-image packed slot).
    """
    N, C, H, W = input.shape
    dtype = input.dtype
    fpad = jnp.pad(input, ((0, 0), (0, 0), (0, 1), (0, 1)))
    packed = jnp.concatenate(
        [fpad[:, :, :H, :W], fpad[:, :, :H, 1:W + 1],
         fpad[:, :, 1:H + 1, :W], fpad[:, :, 1:H + 1, 1:W + 1]],
        axis=1)  # (N, 4C, H, W): slots (dy,dx) = 00, 01, 10, 11
    table = packed.transpose(0, 2, 3, 1).reshape(N, H * W, 4 * C)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    idx = (by * W + bx).reshape(N, Ho * Wo)
    # flat 1-D row gather over the batch-flattened table: measured ~15%
    # faster than the batched take_along_axis at the volume-render shape
    # (51 vs 60 ms/pass for 4.7M rows, value-fetched A/B — see
    # docs/STAGE_PROFILE.md). Indices are in-bounds by construction
    # (clipped above), so PROMISE_IN_BOUNDS skips the clamp pass.
    flat = table.reshape(N * H * W, 4 * C)
    fidx = (idx + (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None])
    g = jax.lax.gather(
        flat, fidx.reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(offset_dims=(1,),
                                       collapsed_slice_dims=(0,),
                                       start_index_map=(0,)),
        slice_sizes=(1, 4 * C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    g = g.reshape(N, Ho * Wo, 4 * C)

    wx0 = 1 - wx1
    wy0 = 1 - wy1

    def axis_w(b, t0, w0, w1, d):
        # weight of packed slot b+d along one axis (f32; cast at product)
        return w0 * (b + d == t0) + w1 * (b + d == t0 + 1)

    out = 0
    for slot, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        w = (axis_w(by, y0, wy0, wy1, dy)
             * axis_w(bx, x0, wx0, wx1, dx)).astype(dtype).reshape(
                 N, Ho * Wo, 1)
        out = out + g[..., slot * C:(slot + 1) * C] * w
    return out.reshape(N, Ho, Wo, C).transpose(0, 3, 1, 2)
