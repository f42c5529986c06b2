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


# ---------------------------------------------------------------------------
# Binned segment rasterizer — the production TPU path.
#
# Round-1 profiling showed the XLA tiled rasterizer spends ~150ms in per-tile
# top_k binning and ~400ms in candidate take_along_axis gathers (batch 4 x 4
# views @ 256^2). This design removes both:
#   * binning = sort-by-tile: each face emits 4 entries (the tiles of its
#     bbox corners; with TILE=32 > max FLAME face span this covers every
#     overlapped tile exactly); entries are key-sorted by tile id — one
#     lax.sort_key_val per image instead of T top_k calls;
#   * candidate data = ONE row-gather into sorted order (contiguous
#     segments), so the kernel reads each tile's candidates with a single
#     strided DMA — zero gathers inside the hot loop;
#   * visibility = VPU brute force per tile over its real candidate count
#     (dynamic trip count), candidates on lanes x pixels on sublanes, with
#     a striped (pixel, lane) min carry resolved once at the end.
# ---------------------------------------------------------------------------

TILE = 32  # pixels per tile side; must exceed the max face bbox span

# Per-tile candidate-segment DMA window (f32 entries). The construction-time
# guard (models/triplane_next3d.py _validate_rasterizer_capacity) checks the
# topology against THIS constant; FLAME @256 needs <=2120 entries/tile
# (x1.25 expression slack + 128 alignment skip < 4096). Halved from 8192 in
# round 4: the kernel DMAs the full window per non-empty tile, so the window
# size is pure per-tile latency.
MAX_SEG = 4096


def _binned_prep(coeffs, tids, T, max_seg):
    """Shared XLA-side prep for the binned kernels: sort entries by tile id,
    compute segment starts, lay out the coeff-major slab.

    Round-4 reformulation (docs/STAGE_PROFILE.md): the original
    sort_key_val + histogram scatter-add + slab row-gather spent ~11.5 ns
    per entry on BOTH the (B, 4F) scatter and the (B*4F)-row gather. One
    multi-operand ``lax.sort`` carries all coeff channels with the key
    (the unify_samples trick), and segment starts come from a
    compare-reduce over the sorted keys — zero scatters, zero gathers.

    coeffs: (B, E, K) f32; tids: (B, E) int32 (dummy = T for dropped).
    Returns starts (B*(T+1),) int32 and slab (B, K, E + max_seg) f32.
    """
    K = coeffs.shape[-1]
    ops = [tids] + [coeffs[..., k] for k in range(K)]
    res = jax.lax.sort(ops, dimension=1, num_keys=1)
    tids_sorted = res[0]
    slab = jnp.stack(res[1:], axis=1)                       # (B, K, E)
    boundaries = jnp.arange(T + 1, dtype=jnp.int32)
    starts = jnp.sum(
        (tids_sorted[:, None, :] < boundaries[None, :, None]).astype(jnp.int32),
        axis=-1)                                            # (B, T+1)
    # pad coeff rows to the kernel's 8-aligned scratch height and lanes by
    # the DMA margin
    K_pad = -(-K // 8) * 8
    slab = jnp.pad(slab, ((0, 0), (0, K_pad - K), (0, max_seg)))
    return starts.reshape(-1), slab


def _binned_kernel(starts_ref, slab_ref, fid_out, zbuf_out, seg, zmin, fidc,
                   dma_sem, *, tiles_x, max_seg, n_coeff=13):
    """Grid (B, T). slab_ref: (B, 16, E_total) coeff-major candidate slab
    (rows: b0c,b0x,b0y,b1c,b1x,b1y,b2c,b2x,b2y,zc,zx,zy,fid).
    starts_ref (scalar prefetch): (B*(T+1),) segment starts.

    Pixel layout: tile-local pixel p = s*128 + g (sublane s in 0..7, lane
    group g in 0..127); image row = p // TILE, col = p % TILE. Because
    128 % TILE == 0, all 8 pixels of a group share one COLUMN (g % TILE)
    and differ only in row — so per (packet, group) the x coordinate is a
    scalar and y is an (8,1) vector; no dynamic lane extraction needed.
    The min carry is striped: carry row r = g*8 + s, lane = candidate
    index mod 128; resolved across lanes once after all packets.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    base = b * (T + 1)
    start = starts_ref[base + t]
    n = starts_ref[base + t + 1] - start
    # HBM lane slices must be 128-aligned: fetch from the floor boundary and
    # mask the skipped prefix in-loop
    astart = pl.multiple_of((start // 128) * 128, 128)
    skip = start - astart

    @pl.when(n == 0)
    def _empty():
        fid_out[0, 0] = jnp.full((8, 128), -1, jnp.int32)
        zbuf_out[0, 0] = jnp.full((8, 128), BIG_Z, jnp.float32)

    @pl.when(n > 0)
    def _nonempty():
        cp = pltpu.make_async_copy(
            slab_ref.at[b, :, pl.ds(astart, max_seg)], seg, dma_sem)
        cp.start()

        base_x = (t % tiles_x) * TILE
        base_y = (t // tiles_x) * TILE
        # per-group y vector: row = s*4 + g//32 (TILE=32 -> 4 rows/sublane)
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        gy_base = (base_y + s8 * (128 // TILE)).astype(jnp.float32)  # (8,1)

        zmin[...] = jnp.full((1024, 128), BIG_Z, jnp.float32)
        fidc[...] = jnp.full((1024, 128), 2.0 ** 30, jnp.float32)

        cp.wait()

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def packet(i, _):
            off = pl.multiple_of(i * 128, 128)
            lane_g = lane128 + off
            valid = (lane_g >= skip) & (lane_g < skip + n)       # (1,128)
            c = [seg[j, pl.ds(off, 128)].reshape(1, 128)
                 for j in range(n_coeff)]
            b0c, b0x, b0y, b1c, b1x, b1y, b2c, b2x, b2y, zc, zx, zy, fidv = c

            def group(g, _):
                gx = (base_x + g % TILE).astype(jnp.float32)      # scalar
                gy = gy_base + (g // TILE).astype(jnp.float32)    # (8,1)
                w0 = b0c + b0x * gx + b0y * gy                    # (8,128)
                w1 = b1c + b1x * gx + b1y * gy
                w2 = b2c + b2x * gx + b2y * gy
                inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid
                z = zc + zx * gx + zy * gy
                z = jnp.where(inside, z, BIG_Z)
                r = pl.multiple_of(g * 8, 8)
                zold = zmin[pl.ds(r, 8), :]
                fold = fidc[pl.ds(r, 8), :]
                better = (z < zold) | ((z == zold) & (fidv < fold) & inside)
                zmin[pl.ds(r, 8), :] = jnp.where(better, z, zold)
                fidc[pl.ds(r, 8), :] = jnp.where(better, fidv, fold)
                return 0

            jax.lax.fori_loop(0, 128, group, 0)
            return 0

        # clamp so packets never read beyond the DMA'd max_seg window even
        # if a tile's segment overflows (callers validate capacity at
        # construction; this keeps an overflow bounded-wrong instead of
        # reading garbage)
        nb = jnp.minimum(pl.cdiv(skip + n, 128), max_seg // 128)
        jax.lax.fori_loop(0, nb, packet, 0)

        # resolve across the 128 candidate lanes: min z, tie -> min fid
        zrow = jnp.min(zmin[...], axis=1, keepdims=True)          # (1024,1)
        ftie = jnp.where(zmin[...] == zrow, fidc[...], 2.0 ** 30)
        frow = jnp.min(ftie, axis=1, keepdims=True)               # (1024,1)
        # carry row r = g*8+s holds pixel p = s*128+g: (128,8) -> T -> (8,128)
        zbuf_out[0, 0] = zrow.reshape(128, 8).T
        f = frow.reshape(128, 8).T
        fid_out[0, 0] = jnp.where(f >= 2.0 ** 30, -1, f).astype(jnp.int32)


def _binned_attr_kernel(starts_ref, slab_ref, fid_out, u_out, v_out, seg,
                        zmin, fidc, ubuf, vbuf, dma_sem, *, tiles_x, max_seg,
                        n_coeff=19):
    """UV-emitting variant of ``_binned_kernel``: the slab carries two extra
    affine attribute channels (u, v) interpolated at the winning pixel, so
    the caller needs NO per-pixel attribute gather afterwards (replaces
    ``interpolate_face_attributes`` for affine per-face attributes).

    slab rows: b0c,b0x,b0y, b1c,b1x,b1y, b2c,b2x,b2y, zc,zx,zy,
               uc,ux,uy, vc,vx,vy, fid  (19 of 24; rest padding).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    base = b * (T + 1)
    start = starts_ref[base + t]
    n = starts_ref[base + t + 1] - start
    astart = pl.multiple_of((start // 128) * 128, 128)
    skip = start - astart

    # empty tiles (background — typically 30-50% of the 4-view FLAME grid)
    # skip the segment DMA, carry init, candidate loop, and resolve entirely
    @pl.when(n == 0)
    def _empty():
        fid_out[0, 0] = jnp.full((8, 128), -1, jnp.int32)
        u_out[0, 0] = jnp.zeros((8, 128), jnp.float32)
        v_out[0, 0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(n > 0)
    def _nonempty():
        cp = pltpu.make_async_copy(
            slab_ref.at[b, :, pl.ds(astart, max_seg)], seg, dma_sem)
        cp.start()

        base_x = (t % tiles_x) * TILE
        base_y = (t // tiles_x) * TILE
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        gy_base = (base_y + s8 * (128 // TILE)).astype(jnp.float32)  # (8,1)

        zmin[...] = jnp.full((1024, 128), BIG_Z, jnp.float32)
        fidc[...] = jnp.full((1024, 128), 2.0 ** 30, jnp.float32)
        ubuf[...] = jnp.zeros((1024, 128), jnp.float32)
        vbuf[...] = jnp.zeros((1024, 128), jnp.float32)

        cp.wait()

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def packet(i, _):
            off = pl.multiple_of(i * 128, 128)
            lane_g = lane128 + off
            valid = (lane_g >= skip) & (lane_g < skip + n)       # (1,128)
            c = [seg[j, pl.ds(off, 128)].reshape(1, 128)
                 for j in range(n_coeff)]
            (b0c, b0x, b0y, b1c, b1x, b1y, b2c, b2x, b2y,
             zc, zx, zy, uc, ux, uy, vc, vx, vy, fidv) = c

            def group(g, _):
                gx = (base_x + g % TILE).astype(jnp.float32)      # scalar
                gy = gy_base + (g // TILE).astype(jnp.float32)    # (8,1)
                w0 = b0c + b0x * gx + b0y * gy                    # (8,128)
                w1 = b1c + b1x * gx + b1y * gy
                w2 = b2c + b2x * gx + b2y * gy
                inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid
                z = zc + zx * gx + zy * gy
                z = jnp.where(inside, z, BIG_Z)
                r = pl.multiple_of(g * 8, 8)
                zold = zmin[pl.ds(r, 8), :]
                fold = fidc[pl.ds(r, 8), :]
                better = (z < zold) | ((z == zold) & (fidv < fold) & inside)
                zmin[pl.ds(r, 8), :] = jnp.where(better, z, zold)
                fidc[pl.ds(r, 8), :] = jnp.where(better, fidv, fold)
                ubuf[pl.ds(r, 8), :] = jnp.where(
                    better, uc + ux * gx + uy * gy, ubuf[pl.ds(r, 8), :])
                vbuf[pl.ds(r, 8), :] = jnp.where(
                    better, vc + vx * gx + vy * gy, vbuf[pl.ds(r, 8), :])
                return 0

            jax.lax.fori_loop(0, 128, group, 0)
            return 0

        nb = jnp.minimum(pl.cdiv(skip + n, 128), max_seg // 128)
        jax.lax.fori_loop(0, nb, packet, 0)

        # resolve across candidate lanes: min z, tie -> min fid; u/v follow
        # the winning lane (a face appears at most once per tile segment, so
        # the (z, fid) pair identifies one lane)
        zrow = jnp.min(zmin[...], axis=1, keepdims=True)          # (1024,1)
        ftie = jnp.where(zmin[...] == zrow, fidc[...], 2.0 ** 30)
        frow = jnp.min(ftie, axis=1, keepdims=True)               # (1024,1)
        sel = (zmin[...] == zrow) & (fidc[...] == frow)
        urow = jnp.min(jnp.where(sel, ubuf[...], BIG_Z), axis=1,
                       keepdims=True)
        vrow = jnp.min(jnp.where(sel, vbuf[...], BIG_Z), axis=1,
                       keepdims=True)
        hit = frow < 2.0 ** 30
        f = jnp.where(hit, frow, -1.0)
        fid_out[0, 0] = f.reshape(128, 8).T.astype(jnp.int32)
        u_out[0, 0] = jnp.where(hit, urow, 0.0).reshape(128, 8).T
        v_out[0, 0] = jnp.where(hit, vrow, 0.0).reshape(128, 8).T


def _binned_uv_entries(verts, faces, face_attrs, image_size, max_seg):
    """XLA-side prep of the UV-emitting binned rasterizer: per-face affine
    coefficients, 4 bbox-corner tile entries, multi-operand sort into the
    (starts, slab) layout the kernel consumes. Split out so tools/profile.py
    can time prep vs kernel independently."""
    verts = jax.lax.stop_gradient(verts)
    face_attrs = jax.lax.stop_gradient(face_attrs)
    B = verts.shape[0]
    F = faces.shape[0]
    H = W = image_size
    assert H % TILE == 0
    Tx = W // TILE
    T = Tx * (H // TILE)
    faces = faces.astype(jnp.int32)

    px = (verts[..., 0] + 1) * (W / 2) - 0.5
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    fx = px[:, faces]                                        # (B, F, 3)
    fy = py[:, faces]
    fz = verts[..., 2][:, faces]
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]
    z0, z1, z2 = fz[..., 0], fz[..., 1], fz[..., 2]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    keep = area > 1e-8
    inv = jnp.where(keep, 1.0 / jnp.where(keep, area, 1.0), 0.0)

    def edge_coeffs(xa, ya, xb, yb):
        cx = -(yb - ya) * inv
        cy = (xb - xa) * inv
        cc = ((yb - ya) * xa - (xb - xa) * ya) * inv
        return cc, cx, cy

    b0c, b0x, b0y = edge_coeffs(x1, y1, x2, y2)
    b1c, b1x, b1y = edge_coeffs(x2, y2, x0, y0)
    b2c, b2x, b2y = edge_coeffs(x0, y0, x1, y1)

    def affine(a0, a1, a2):
        return (b0c * a0 + b1c * a1 + b2c * a2,
                b0x * a0 + b1x * a1 + b2x * a2,
                b0y * a0 + b1y * a1 + b2y * a2)

    zc, zx, zy = affine(z0, z1, z2)
    fa = jnp.broadcast_to(face_attrs, (B, F, 3, 2))
    uc, ux, uy = affine(fa[..., 0, 0], fa[..., 1, 0], fa[..., 2, 0])
    vc, vx, vy = affine(fa[..., 0, 1], fa[..., 1, 1], fa[..., 2, 1])
    b0c = jnp.where(keep, b0c, -jnp.inf)
    fidf = jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[None], (B, F))
    coeffs = jnp.stack([b0c, b0x, b0y, b1c, b1x, b1y, b2c, b2x, b2y,
                        zc, zx, zy, uc, ux, uy, vc, vx, vy, fidf],
                       axis=-1)                              # (B, F, 19)

    txlo = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(x0, x1), x2) / TILE),
                    0, Tx - 1).astype(jnp.int32)
    txhi = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(x0, x1), x2) / TILE),
                    0, Tx - 1).astype(jnp.int32)
    tylo = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(y0, y1), y2) / TILE),
                    0, H // TILE - 1).astype(jnp.int32)
    tyhi = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(y0, y1), y2) / TILE),
                    0, H // TILE - 1).astype(jnp.int32)
    dummy = jnp.int32(T)
    e00 = tylo * Tx + txlo
    e01 = jnp.where(txhi > txlo, tylo * Tx + txhi, dummy)
    e10 = jnp.where(tyhi > tylo, tyhi * Tx + txlo, dummy)
    e11 = jnp.where((txhi > txlo) & (tyhi > tylo), tyhi * Tx + txhi, dummy)
    tids = jnp.stack([e00, e01, e10, e11], axis=-1)          # (B, F, 4)
    tids = jnp.where(keep[..., None], tids, dummy).reshape(B, 4 * F)

    # each face's coeff row is replicated to its (up to) 4 tile entries so
    # the multi-operand sort can carry the payload with the key
    entries = jnp.repeat(coeffs, 4, axis=1)                  # (B, 4F, 24)
    return _binned_prep(entries, tids, T, max_seg)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def rasterize_mesh_pallas_binned_uv(verts, faces, face_attrs, image_size,
                                    max_seg=MAX_SEG, interpret=False):
    """Sort-binned rasterizer that ALSO emits barycentric-interpolated
    per-face attributes (u, v) at the winning face of each pixel.

    verts: (B, V, 3); faces: (F, 3); face_attrs: (B or 1, F, 3, 2) —
    per-corner (u, v). Returns (pix_to_face (B,H,W) i32, u (B,H,W) f32,
    v (B,H,W) f32). Visibility semantics identical to
    ``rasterize_mesh_pallas_binned``; attribute values equal
    ``interpolate_face_attributes`` (same unclamped barycentric affine).
    Non-differentiable (inputs are stop-gradiented) — the flagship model
    stop-gradients the rasterization anyway (triplane_next3d rasterize).
    """
    B = verts.shape[0]
    H = W = image_size
    Tx = W // TILE
    T = Tx * (H // TILE)
    starts, slab = _binned_uv_entries(verts, faces, face_attrs, image_size,
                                      max_seg)

    kernel = functools.partial(_binned_attr_kernel, tiles_x=Tx,
                               max_seg=max_seg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, 8, 128), lambda b, t, *_: (b, t, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((24, max_seg), jnp.float32),   # segment
            pltpu.VMEM((1024, 128), jnp.float32),     # z carry
            pltpu.VMEM((1024, 128), jnp.float32),     # fid carry
            pltpu.VMEM((1024, 128), jnp.float32),     # u carry
            pltpu.VMEM((1024, 128), jnp.float32),     # v carry
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    fid, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(starts, slab)

    def unscramble(a):
        a = a.reshape(B, H // TILE, Tx, TILE * TILE // TILE, TILE)
        return a.transpose(0, 1, 3, 2, 4).reshape(B, H, W)

    return unscramble(fid), unscramble(u), unscramble(v)


# ---------------------------------------------------------------------------
# TILE=16 UV variant. The binned kernel's inner cost is
# (candidate entries) x (pixels per tile) — measured issue-bound at ~30 VPU
# ops per (128-candidate packet, 8-pixel group). Quartering the tile area
# (1024 -> 256 px) quarters that product for near-unchanged total entry
# count; the price is the 3x3 bbox-rectangle emission (9 entries/face in
# the sort instead of 4, extras routed to the dummy tile) because a <32px
# face bbox can straddle 3 16px tiles per axis.
# ---------------------------------------------------------------------------

TILE16 = 16
MAX_SEG16 = 1024  # FLAME @256 tile=16 occupancy 591 * 1.25 + 128 < 1024


def _binned_attr_kernel16(starts_ref, slab_ref, fid_out, u_out, v_out, seg,
                          zmin, fidc, ubuf, vbuf, dma_sem, *, tiles_x,
                          max_seg, n_coeff=19):
    """TILE=16 analog of ``_binned_attr_kernel`` (same slab rows).

    Pixel layout: tile-local pixel p = g + s*32 (group g in 0..31, sublane
    s in 0..7); image row = p // 16 = g//16 + s*2, col = p % 16 = g % 16
    (32 % 16 == 0, so a (g, s)-column's 8 pixels share col g%16 — x is a
    scalar and y an (8,1) vector per group, as in the TILE=32 kernel).
    Carry row r = g*8 + s. The resolved 16x16 tile is emitted in the first
    32 LANES of the (8,128) output block as [s, g] (pixel p = s*32 + g);
    the XLA side slices [..., :32] and unscrambles.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    base = b * (T + 1)
    start = starts_ref[base + t]
    n = starts_ref[base + t + 1] - start
    astart = pl.multiple_of((start // 128) * 128, 128)
    skip = start - astart

    @pl.when(n == 0)
    def _empty():
        fid_out[0, 0] = jnp.full((8, 128), -1, jnp.int32)
        u_out[0, 0] = jnp.zeros((8, 128), jnp.float32)
        v_out[0, 0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(n > 0)
    def _nonempty():
        cp = pltpu.make_async_copy(
            slab_ref.at[b, :, pl.ds(astart, max_seg)], seg, dma_sem)
        cp.start()

        base_x = (t % tiles_x) * TILE16
        base_y = (t // tiles_x) * TILE16
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        gy_base = (base_y + s8 * 2).astype(jnp.float32)       # (8,1)

        zmin[...] = jnp.full((256, 128), BIG_Z, jnp.float32)
        fidc[...] = jnp.full((256, 128), 2.0 ** 30, jnp.float32)
        ubuf[...] = jnp.zeros((256, 128), jnp.float32)
        vbuf[...] = jnp.zeros((256, 128), jnp.float32)

        cp.wait()

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def packet(i, _):
            off = pl.multiple_of(i * 128, 128)
            lane_g = lane128 + off
            valid = (lane_g >= skip) & (lane_g < skip + n)       # (1,128)
            c = [seg[j, pl.ds(off, 128)].reshape(1, 128)
                 for j in range(n_coeff)]
            (b0c, b0x, b0y, b1c, b1x, b1y, b2c, b2x, b2y,
             zc, zx, zy, uc, ux, uy, vc, vx, vy, fidv) = c

            def group(g, _):
                gx = (base_x + g % TILE16).astype(jnp.float32)   # scalar
                gy = gy_base + (g // TILE16).astype(jnp.float32)  # (8,1)
                w0 = b0c + b0x * gx + b0y * gy                    # (8,128)
                w1 = b1c + b1x * gx + b1y * gy
                w2 = b2c + b2x * gx + b2y * gy
                inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid
                z = zc + zx * gx + zy * gy
                z = jnp.where(inside, z, BIG_Z)
                r = pl.multiple_of(g * 8, 8)
                zold = zmin[pl.ds(r, 8), :]
                fold = fidc[pl.ds(r, 8), :]
                better = (z < zold) | ((z == zold) & (fidv < fold) & inside)
                zmin[pl.ds(r, 8), :] = jnp.where(better, z, zold)
                fidc[pl.ds(r, 8), :] = jnp.where(better, fidv, fold)
                ubuf[pl.ds(r, 8), :] = jnp.where(
                    better, uc + ux * gx + uy * gy, ubuf[pl.ds(r, 8), :])
                vbuf[pl.ds(r, 8), :] = jnp.where(
                    better, vc + vx * gx + vy * gy, vbuf[pl.ds(r, 8), :])
                return 0

            jax.lax.fori_loop(0, 32, group, 0)
            return 0

        nb = jnp.minimum(pl.cdiv(skip + n, 128), max_seg // 128)
        jax.lax.fori_loop(0, nb, packet, 0)

        # resolve across candidate lanes; (256,1) carry -> (8,32) [s, g]
        zrow = jnp.min(zmin[...], axis=1, keepdims=True)          # (256,1)
        ftie = jnp.where(zmin[...] == zrow, fidc[...], 2.0 ** 30)
        frow = jnp.min(ftie, axis=1, keepdims=True)
        sel = (zmin[...] == zrow) & (fidc[...] == frow)
        urow = jnp.min(jnp.where(sel, ubuf[...], BIG_Z), axis=1,
                       keepdims=True)
        vrow = jnp.min(jnp.where(sel, vbuf[...], BIG_Z), axis=1,
                       keepdims=True)
        hit = frow < 2.0 ** 30

        def emit(row, fill):
            lanes32 = row.reshape(32, 8).T                        # (8,32)
            return jnp.concatenate(
                [lanes32, jnp.full((8, 96), fill, jnp.float32)], axis=1)

        fid_out[0, 0] = emit(jnp.where(hit, frow, -1.0),
                             -1.0).astype(jnp.int32)
        u_out[0, 0] = emit(jnp.where(hit, urow, 0.0), 0.0)
        v_out[0, 0] = emit(jnp.where(hit, vrow, 0.0), 0.0)


def _binned_uv_entries16(verts, faces, face_attrs, image_size, max_seg):
    """Prep for the TILE=16 UV kernel: same affine coefficients as
    ``_binned_uv_entries`` but 9 tile entries per face (the 3x3 rectangle
    from the bbox-min tile; out-of-rectangle and culled entries go to the
    dummy tile). Exact for face bbox spans < 32 px (same guard as TILE=32:
    span s overlaps at most ceil(s/16)+1 = 3 tiles per axis)."""
    verts = jax.lax.stop_gradient(verts)
    face_attrs = jax.lax.stop_gradient(face_attrs)
    B = verts.shape[0]
    F = faces.shape[0]
    H = W = image_size
    assert H % TILE16 == 0
    Tx = W // TILE16
    Ty = H // TILE16
    T = Tx * Ty
    faces = faces.astype(jnp.int32)

    px = (verts[..., 0] + 1) * (W / 2) - 0.5
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    fx = px[:, faces]                                        # (B, F, 3)
    fy = py[:, faces]
    fz = verts[..., 2][:, faces]
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]
    z0, z1, z2 = fz[..., 0], fz[..., 1], fz[..., 2]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    keep = area > 1e-8
    inv = jnp.where(keep, 1.0 / jnp.where(keep, area, 1.0), 0.0)

    def edge_coeffs(xa, ya, xb, yb):
        cx = -(yb - ya) * inv
        cy = (xb - xa) * inv
        cc = ((yb - ya) * xa - (xb - xa) * ya) * inv
        return cc, cx, cy

    b0c, b0x, b0y = edge_coeffs(x1, y1, x2, y2)
    b1c, b1x, b1y = edge_coeffs(x2, y2, x0, y0)
    b2c, b2x, b2y = edge_coeffs(x0, y0, x1, y1)

    def affine(a0, a1, a2):
        return (b0c * a0 + b1c * a1 + b2c * a2,
                b0x * a0 + b1x * a1 + b2x * a2,
                b0y * a0 + b1y * a1 + b2y * a2)

    zc, zx, zy = affine(z0, z1, z2)
    fa = jnp.broadcast_to(face_attrs, (B, F, 3, 2))
    uc, ux, uy = affine(fa[..., 0, 0], fa[..., 1, 0], fa[..., 2, 0])
    vc, vx, vy = affine(fa[..., 0, 1], fa[..., 1, 1], fa[..., 2, 1])
    b0c = jnp.where(keep, b0c, -jnp.inf)
    fidf = jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[None], (B, F))
    coeffs = jnp.stack([b0c, b0x, b0y, b1c, b1x, b1y, b2c, b2x, b2y,
                        zc, zx, zy, uc, ux, uy, vc, vx, vy, fidf],
                       axis=-1)                              # (B, F, 19)

    txlo = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(x0, x1), x2) / TILE16),
                    0, Tx - 1).astype(jnp.int32)
    txhi = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(x0, x1), x2) / TILE16),
                    0, Tx - 1).astype(jnp.int32)
    tylo = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(y0, y1), y2) / TILE16),
                    0, Ty - 1).astype(jnp.int32)
    tyhi = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(y0, y1), y2) / TILE16),
                    0, Ty - 1).astype(jnp.int32)
    dummy = jnp.int32(T)
    ts = []
    for dy in range(3):
        for dx in range(3):
            tx = txlo + dx
            ty = tylo + dy
            ok = keep & (tx <= txhi) & (ty <= tyhi)
            ts.append(jnp.where(ok, ty * Tx + tx, dummy))
    tids = jnp.stack(ts, axis=-1).reshape(B, 9 * F)
    entries = jnp.repeat(coeffs, 9, axis=1)                  # (B, 9F, 19)
    return _binned_prep(entries, tids, T, max_seg)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def rasterize_mesh_pallas_binned_uv16(verts, faces, face_attrs, image_size,
                                      max_seg=MAX_SEG16, interpret=False):
    """TILE=16 UV-emitting binned rasterizer — same contract and semantics
    as ``rasterize_mesh_pallas_binned_uv`` (exact for bbox spans < 32 px
    and per-tile occupancy <= max_seg; validate with
    required_tile_capacity(tile=16))."""
    B = verts.shape[0]
    H = W = image_size
    Tx = W // TILE16
    T = Tx * (H // TILE16)
    starts, slab = _binned_uv_entries16(verts, faces, face_attrs, image_size,
                                        max_seg)

    kernel = functools.partial(_binned_attr_kernel16, tiles_x=Tx,
                               max_seg=max_seg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, 8, 128), lambda b, t, *_: (b, t, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((24, max_seg), jnp.float32),   # segment
            pltpu.VMEM((256, 128), jnp.float32),      # z carry
            pltpu.VMEM((256, 128), jnp.float32),      # fid carry
            pltpu.VMEM((256, 128), jnp.float32),      # u carry
            pltpu.VMEM((256, 128), jnp.float32),      # v carry
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    fid, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(starts, slab)

    def unscramble(a):
        # lanes [s, g<32] hold pixel p = s*32 + g; row = p//16, col = p%16
        a = a[..., :32].reshape(B, H // TILE16, Tx, 256)
        a = a.reshape(B, H // TILE16, Tx, TILE16, TILE16)
        return a.transpose(0, 1, 3, 2, 4).reshape(B, H, W)

    return unscramble(fid), unscramble(u), unscramble(v)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def rasterize_mesh_pallas_binned(verts, faces, image_size, max_seg=MAX_SEG,
                                 interpret=False):
    """Sort-binned Pallas rasterizer (see module notes above).

    Same contract as render/rasterizer.rasterize_mesh: verts (B, V, 3) with
    x, y in [-1, 1] (pixel col = (x+1)*W/2 - 0.5), z depth, smaller z wins,
    ties -> lower face id; faces (F, 3) shared topology; backface culling by
    signed area > 1e-8. EXACT (no capacity heuristic) provided
    (a) every face bbox spans < TILE=32 pixels per axis
        (required_patch_size < 32 — holds for FLAME @ 256), and
    (b) no tile receives more than max_seg entries (use
        required_tile_capacity(tile=32) * 4 margin to validate).

    Returns (pix_to_face (B, H, W) int32, zbuf (B, H, W) f32).
    """
    verts = jax.lax.stop_gradient(verts)
    B = verts.shape[0]
    F = faces.shape[0]
    H = W = image_size
    assert H % TILE == 0
    Tx = W // TILE
    T = Tx * (H // TILE)
    faces = faces.astype(jnp.int32)

    px = (verts[..., 0] + 1) * (W / 2) - 0.5
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    fx = px[:, faces]                                        # (B, F, 3)
    fy = py[:, faces]
    fz = verts[..., 2][:, faces]
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]
    z0, z1, z2 = fz[..., 0], fz[..., 1], fz[..., 2]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    keep = area > 1e-8
    inv = jnp.where(keep, 1.0 / jnp.where(keep, area, 1.0), 0.0)

    # barycentric/z affine coefficients in pixel coords (w_i/area as
    # c + x*px + y*py); culled faces get b0c = -inf so inside is never true
    def edge_coeffs(xa, ya, xb, yb):
        cx = -(yb - ya) * inv
        cy = (xb - xa) * inv
        cc = ((yb - ya) * xa - (xb - xa) * ya) * inv
        return cc, cx, cy

    b0c, b0x, b0y = edge_coeffs(x1, y1, x2, y2)
    b1c, b1x, b1y = edge_coeffs(x2, y2, x0, y0)
    b2c, b2x, b2y = edge_coeffs(x0, y0, x1, y1)
    zc = b0c * z0 + b1c * z1 + b2c * z2
    zx = b0x * z0 + b1x * z1 + b2x * z2
    zy = b0y * z0 + b1y * z1 + b2y * z2
    b0c = jnp.where(keep, b0c, -jnp.inf)
    fidf = jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[None], (B, F))
    coeffs = jnp.stack([b0c, b0x, b0y, b1c, b1x, b1y, b2c, b2x, b2y,
                        zc, zx, zy, fidf], axis=-1)          # (B, F, 13)

    # 4 bbox-corner tile entries per face; duplicates and culled faces are
    # routed to the dummy tile T (sorted to the end, never visited)
    txlo = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(x0, x1), x2) / TILE),
                    0, Tx - 1).astype(jnp.int32)
    txhi = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(x0, x1), x2) / TILE),
                    0, Tx - 1).astype(jnp.int32)
    tylo = jnp.clip(jnp.floor(jnp.minimum(jnp.minimum(y0, y1), y2) / TILE),
                    0, H // TILE - 1).astype(jnp.int32)
    tyhi = jnp.clip(jnp.floor(jnp.maximum(jnp.maximum(y0, y1), y2) / TILE),
                    0, H // TILE - 1).astype(jnp.int32)
    dummy = jnp.int32(T)
    e00 = tylo * Tx + txlo
    e01 = jnp.where(txhi > txlo, tylo * Tx + txhi, dummy)
    e10 = jnp.where(tyhi > tylo, tyhi * Tx + txlo, dummy)
    e11 = jnp.where((txhi > txlo) & (tyhi > tylo), tyhi * Tx + txhi, dummy)
    tids = jnp.stack([e00, e01, e10, e11], axis=-1)          # (B, F, 4)
    tids = jnp.where(keep[..., None], tids, dummy).reshape(B, 4 * F)

    # multi-operand sort carries coeffs with the tile key; segment starts
    # from a compare-reduce (zero scatters/gathers — see _binned_prep)
    entries = jnp.repeat(coeffs, 4, axis=1)                  # (B, 4F, 13)
    starts, slab = _binned_prep(entries, tids, T, max_seg)

    kernel = functools.partial(_binned_kernel, tiles_x=Tx, max_seg=max_seg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # slab stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 8, 128), lambda b, t, *_: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, t, *_: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, max_seg), jnp.float32),   # segment
            pltpu.VMEM((1024, 128), jnp.float32),     # z carry
            pltpu.VMEM((1024, 128), jnp.float32),     # fid carry
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    fid, zbuf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(starts, slab)

    # unscramble: (B, T, 8, 128) with p = s*128 + g -> (B, H, W)
    def unscramble(a):
        a = a.reshape(B, H // TILE, Tx, TILE * TILE // TILE, TILE)
        # p = row-major within tile: (B, Ty, Tx, TILE(rows), TILE(cols))
        return a.transpose(0, 1, 3, 2, 4).reshape(B, H, W)

    return unscramble(fid), unscramble(zbuf)
