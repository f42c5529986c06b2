"""Fused tri-plane sampling via in-kernel VMEM gathers (tpu.dynamic_gather).

The volume renderer's dominant cost is the tri-plane bilinear gather
(reference hot path: training_avatar_texture/volumetric_rendering/
renderer.py:62-72 + :149-155). The XLA path gathers 2x2-packed rows from
HBM at random addresses; this kernel instead keeps the plane tables
VMEM-RESIDENT and gathers with Mosaic's lane-wise ``tpu.dynamic_gather``
(the lowering of 2D ``jnp.take_along_axis(axis=1)`` with FULL-table-shaped
indices — the only supported form, mapped by AOT lowering in round 3).

Design (variant A: full-table, channel-grouped, plane-looped):
- tables: planes reshaped (B, 3, G, 8, H*W) — C split into G groups of 8
  sublanes so one gather covers one channel group across ALL H*W lanes.
- grid (B, G, T): per step the 3 plane tables of one channel group are
  VMEM-resident (pipeline-fetched once per (b, g) since they are constant
  over T); the kernel loops the 3 planes, computes bilinear corners +
  weights in f32 (positional precision per ADVICE r2), does 4 full-width
  gathers per plane, and accumulates the plane MEAN directly (what the
  OSGDecoder consumes, triplane_next3d.py:354).
- sample tile width == table width (H*W): the full-shape-index constraint
  makes the gather emit one sample per table lane, so S pads up to a
  multiple of H*W (the flagship render is exactly 6 tiles of 65536 per
  batch entry: 4096 rays x 96 depths).

Projection onto the 3 planes is a pure component swap under the EG3D axis
matrices (renderer.py:30-44): uv0=(x,y), uv1=(x,z), uv2=(z,y) — computed
in-kernel.

Semantics: identical to ``sample_from_planes(...)`` followed by
``mean(axis=1)`` — grid_sample align_corners=False with zeros padding
(out-of-image corners contribute zero weight). Differentiable via
custom_vjp: the backward pass recomputes through the XLA reference
composition (scatter-add into planes + coord grads), so enabling the
kernel under training is safe — forward takes the fast path, backward
pays one XLA-gather vjp.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coords_ref, tables_ref, out_ref, *, H, W, n_planes, sub):
    # coords block: (1, 1, 3, L) f32 — rows x, y, z, scaled by 2/box_warp
    # tables block: (1, 3, 1, sub, L) — L = H*W
    # out block:    (1, 1, 1, sub, L) f32 — plane mean, channel group g
    L = H * W
    x = coords_ref[0, 0, 0:1, :]                       # (1, L) f32
    y = coords_ref[0, 0, 1:2, :]
    z = coords_ref[0, 0, 2:3, :]

    acc = jnp.zeros((sub, L), jnp.float32)
    for p in range(n_planes):
        u, v = ((x, y), (x, z), (z, y))[p]
        px = (u + 1.0) * (W / 2) - 0.5
        py = (v + 1.0) * (H / 2) - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx1 = px - x0
        wy1 = py - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        tbl = tables_ref[0, p, 0]                      # (sub, L)
        for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
            yi = y0i + dy
            yv = (yi >= 0) & (yi < H)
            yc = jnp.clip(yi, 0, H - 1)
            for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
                xi = x0i + dx
                valid = yv & (xi >= 0) & (xi < W)
                idx = yc * W + jnp.clip(xi, 0, W - 1)  # (1, L)
                idx = jnp.broadcast_to(idx, (sub, L))
                g = jnp.take_along_axis(tbl, idx, axis=1,
                                        mode='promise_in_bounds')
                w = jnp.where(valid, wx * wy, 0.0)     # (1, L) f32
                acc += g.astype(jnp.float32) * w
    out_ref[0, 0, 0] = acc * (1.0 / n_planes)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def sample_planes_mean_fused(plane_features, coordinates, box_warp,
                             gather_bf16=True, interpret=False, sub=8):
    """(N, 3, C, H, W), (N, M, 3) -> (N, M, C): plane-MEAN features, equal to
    ``sample_from_planes(planes, coords, box_warp).mean(axis=1)``.

    ``sub`` = sublane rows per channel group (8 default; 4 halves the VMEM
    working set at 2x the gather count — the hardware A/B picks)."""

    @jax.custom_vjp
    def sample(planes, coords):
        return _sample_impl(planes, coords, box_warp, gather_bf16,
                            interpret, sub)

    def sample_fwd(planes, coords):
        return sample(planes, coords), (planes, coords)

    def sample_bwd(res, g):
        planes, coords = res
        from ..render.renderer import sample_from_planes

        def ref(p, c):
            return sample_from_planes(p, c, box_warp=box_warp,
                                      gather_bf16=gather_bf16).mean(axis=1)

        return jax.vjp(ref, planes, coords)[1](g)

    sample.defvjp(sample_fwd, sample_bwd)
    return sample(plane_features, coordinates)


def _sample_impl(plane_features, coordinates, box_warp, gather_bf16,
                 interpret, sub):
    N, n_planes, C, H, W = plane_features.shape
    assert n_planes == 3 and C % sub == 0
    G = C // sub
    L = H * W
    M = coordinates.shape[1]
    T = -(-M // L)

    tables = plane_features.reshape(N, 3, G, sub, L)
    if gather_bf16 and tables.dtype == jnp.float32:
        tables = tables.astype(jnp.bfloat16)

    coords = (2.0 / box_warp) * coordinates.astype(jnp.float32)
    coords = jnp.pad(coords, ((0, 0), (0, T * L - M), (0, 0)),
                     constant_values=2.0)  # pad points sample off-plane
    coords = coords.reshape(N, T, L, 3).transpose(0, 1, 3, 2)  # (N,T,3,L)

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, n_planes=3, sub=sub),
        grid=(N, G, T),
        in_specs=[
            pl.BlockSpec((1, 1, 3, L), lambda b, g, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 3, 1, sub, L), lambda b, g, t: (b, 0, g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, sub, L),
                               lambda b, g, t: (b, g, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, G, T, sub, L), jnp.float32),
        interpret=interpret,
    )(coords, tables)

    # (N, G, T, sub, L) -> (N, T*L, G*sub) -> (N, M, C)
    out = out.transpose(0, 2, 4, 1, 3).reshape(N, T * L, C)
    return out[:, :M]
