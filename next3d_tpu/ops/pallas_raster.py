"""Pallas TPU kernel for triangle rasterization visibility.

The z-buffer rasterizer is inherently a read-modify-write loop — exactly
what XLA cannot express without scatters (6s/batch) or dense
per-tile brute force (top_k binning, ~0.5s/batch). This kernel keeps the
ENTIRE z-buffer and face-id buffer in VMEM (256^2 f32 = 256 KB each) and
loops faces sequentially, updating only each face's <=PATCH^2 pixel patch
via dynamic slices — the classic rasterizer, at VPU register speed.

Semantics match render/rasterizer.rasterize_mesh (PyTorch3D-compatible:
faces_per_pixel=1, backface culling by signed area, bary>=0 inside test,
min-z wins, earlier face wins z ties).

Per-face inputs are precomputed in XLA (projected pixel coords, z, inverse
area with <=0 for culled faces) so the kernel is pure visibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_Z = 1e10


def _raster_kernel(face_ref, fid_out, zbuf_out,
                   *, num_faces, patch, height, width):
    """face_ref: (1, 10, F_pad) rows = ax,bx,cx, ay,by,cy, az,bz,cz, inv_area."""
    fid_out[...] = jnp.full((1, height, width), -1, jnp.int32)
    zbuf_out[...] = jnp.full((1, height, width), BIG_Z, jnp.float32)

    # Mosaic constraint: dynamic slices must be 8-aligned in the sublane
    # (row) dim and 128-aligned in the lane (col) dim — so each face updates
    # an 8-aligned FULL-WIDTH row stripe (stripe_h x W); the inside test
    # masks the irrelevant columns.
    stripe_h = min(patch + 8, height)
    assert stripe_h % 8 == 0, 'image height and patch must be 8-aligned'
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (stripe_h, width), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (stripe_h, width), 1)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (10, 128), 1)

    def body(f, _):
        # dynamic lane indexing must be 128-aligned on TPU: load the face's
        # aligned (10, 128) column chunk, then extract lane f%128 with a
        # where-reduce (vectorized scalar extraction)
        start = pl.multiple_of((f // 128) * 128, 128)
        chunk = face_ref[0, :, pl.ds(start, 128)]  # (10, 128)
        lane = f - start
        col = jnp.sum(jnp.where(lane_iota == lane, chunk, 0.0), axis=1)  # (10,)
        inv_area = col[9]

        @pl.when(inv_area > 0)
        def _():
            ax = col[0]
            bx = col[1]
            cx = col[2]
            ay = col[3]
            by = col[4]
            cy = col[5]
            az = col[6]
            bz = col[7]
            cz = col[8]

            ymin = jnp.minimum(jnp.minimum(ay, by), cy)
            y0 = jnp.ceil(ymin).astype(jnp.int32)
            # 8-aligned start; height - stripe_h is 8-aligned so clip
            # preserves the multiple (hinted for Mosaic)
            y0 = pl.multiple_of(
                jnp.clip((y0 // 8) * 8, 0, height - stripe_h), 8)

            px = cols_i.astype(jnp.float32)
            py = (y0 + rows_i).astype(jnp.float32)

            w0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
            w1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
            w2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            b0 = w0 * inv_area
            b1 = w1 * inv_area
            b2 = w2 * inv_area
            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
            z = b0 * az + b1 * bz + b2 * cz

            zp = zbuf_out[0, pl.ds(y0, stripe_h), :]
            better = inside & (z < zp)
            zbuf_out[0, pl.ds(y0, stripe_h), :] = jnp.where(better, z, zp)
            fp = fid_out[0, pl.ds(y0, stripe_h), :]
            fid_out[0, pl.ds(y0, stripe_h), :] = jnp.where(better, f, fp)

        return 0

    jax.lax.fori_loop(0, num_faces, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def rasterize_mesh_pallas(verts, faces, image_size, patch=32, interpret=False):
    """Pallas z-buffer rasterizer.

    Args/returns match render/rasterizer.rasterize_mesh: verts (B, V, 3)
    with x,y in [-1,1] and z depth; faces (F, 3) shared topology.
    ``patch`` must cover the max face bbox HEIGHT in pixels
    (required_patch_size; FLAME @256 < 32); the update stripe is full-width,
    so horizontal span is unconstrained.
    """
    verts = jax.lax.stop_gradient(verts)
    B = verts.shape[0]
    F = faces.shape[0]
    H = W = image_size
    faces = faces.astype(jnp.int32)

    px = (verts[..., 0] + 1) * (W / 2) - 0.5
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    pz = verts[..., 2]
    fx = px[:, faces]  # (B, F, 3)
    fy = py[:, faces]
    fz = pz[:, faces]
    area = ((fx[..., 1] - fx[..., 0]) * (fy[..., 2] - fy[..., 0])
            - (fy[..., 1] - fy[..., 0]) * (fx[..., 2] - fx[..., 0]))
    inv_area = jnp.where(area > 1e-8, 1.0 / area, 0.0)  # 0 => culled

    # pack per-face scalars into one lane-padded array (Pallas TPU blocks
    # need the trailing dims to match the array or be (8,128)-aligned)
    F_pad = -(-F // 128) * 128
    face_data = jnp.stack([fx[..., 0], fx[..., 1], fx[..., 2],
                           fy[..., 0], fy[..., 1], fy[..., 2],
                           fz[..., 0], fz[..., 1], fz[..., 2],
                           inv_area], axis=1)  # (B, 10, F)
    face_data = jnp.pad(face_data, ((0, 0), (0, 0), (0, F_pad - F)))

    kernel = functools.partial(_raster_kernel, num_faces=F, patch=patch,
                               height=H, width=W)
    fid, zbuf = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 10, F_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ),
        interpret=interpret,
    )(face_data)
    return fid, zbuf
