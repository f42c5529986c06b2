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


def _raster_kernel(fx_ref, fy_ref, fz_ref, inv_area_ref, fid_out, zbuf_out,
                   *, num_faces, patch, height, width):
    fid_out[...] = jnp.full((1, height, width), -1, jnp.int32)
    zbuf_out[...] = jnp.full((1, height, width), BIG_Z, jnp.float32)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (patch, patch), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (patch, patch), 1)

    def body(f, _):
        inv_area = inv_area_ref[0, f]

        @pl.when(inv_area > 0)
        def _():
            ax = fx_ref[0, f, 0]
            bx = fx_ref[0, f, 1]
            cx = fx_ref[0, f, 2]
            ay = fy_ref[0, f, 0]
            by = fy_ref[0, f, 1]
            cy = fy_ref[0, f, 2]
            az = fz_ref[0, f, 0]
            bz = fz_ref[0, f, 1]
            cz = fz_ref[0, f, 2]

            xmin = jnp.minimum(jnp.minimum(ax, bx), cx)
            ymin = jnp.minimum(jnp.minimum(ay, by), cy)
            x0 = jnp.ceil(xmin).astype(jnp.int32)
            y0 = jnp.ceil(ymin).astype(jnp.int32)
            x0 = jnp.clip(x0, 0, width - patch)
            y0 = jnp.clip(y0, 0, height - patch)

            px = (x0 + cols_i).astype(jnp.float32)
            py = (y0 + rows_i).astype(jnp.float32)

            w0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
            w1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
            w2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            b0 = w0 * inv_area
            b1 = w1 * inv_area
            b2 = w2 * inv_area
            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
            z = b0 * az + b1 * bz + b2 * cz

            zp = zbuf_out[0, pl.ds(y0, patch), pl.ds(x0, patch)]
            better = inside & (z < zp)
            zbuf_out[0, pl.ds(y0, patch), pl.ds(x0, patch)] = \
                jnp.where(better, z, zp)
            fp = fid_out[0, pl.ds(y0, patch), pl.ds(x0, patch)]
            fid_out[0, pl.ds(y0, patch), pl.ds(x0, patch)] = \
                jnp.where(better, f, fp)

        return 0

    jax.lax.fori_loop(0, num_faces, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def rasterize_mesh_pallas(verts, faces, image_size, patch=32, interpret=False):
    """Pallas z-buffer rasterizer.

    Args/returns match render/rasterizer.rasterize_mesh: verts (B, V, 3)
    with x,y in [-1,1] and z depth; faces (F, 3) shared topology.
    ``patch`` must cover the max face bbox span in pixels
    (required_patch_size; FLAME @256 < 32).
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

    kernel = functools.partial(_raster_kernel, num_faces=F, patch=patch,
                               height=H, width=W)
    fid, zbuf = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, F, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, 3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (b, 0), memory_space=pltpu.VMEM),
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
    )(fx, fy, fz, inv_area)
    return fid, zbuf
