"""Differentiable triangle rasterization on TPU (replaces PyTorch3D).

The reference wraps PyTorch3D's CUDA ``rasterize_meshes`` (renderer.py:376-440;
settings: faces_per_pixel=1, blur=0, perspective_correct=False,
cull_backfaces=True) and then barycentric-interpolates per-face attributes.
There is no TPU ecosystem equivalent, so this module implements the same
semantics as two XLA-friendly stages:

  1. VISIBILITY (non-differentiable, like pix_to_face): every face emits a
     static KxK pixel-candidate patch around its screen bbox; candidates
     inside the triangle scatter-min their interpolated z into a z-buffer,
     then a second scatter resolves the winning face id per pixel. Faces are
     processed in chunks via ``lax.map`` to bound transient memory.
  2. ATTRIBUTES (differentiable): given pix_to_face, re-compute barycentric
     coordinates at pixel centers from the projected vertices (gradients flow
     to vertex positions exactly as PyTorch3D's bary_coords do) and
     interpolate attributes; append the visibility/alpha channel.

Coordinate convention (after the reference's double x/y negation cancels
PyTorch3D's "+x left, +y up" NDC): input vertex (x, y) in [-1, 1] maps to
pixel column (x+1)*W/2 - 0.5 and row (y+1)*H/2 - 0.5; z is depth with
SMALLER z in front. Backface culling drops faces with negative signed area
(v1-v0) x (v2-v0) in this convention — invariant under the double negation,
so it matches PyTorch3D's EdgeFunction area test.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG_Z = jnp.float32(1e10)


def _edge(ax, ay, bx, by, px, py):
    """Signed area * 2 of triangle (a, b, p) — PyTorch3D's EdgeFunction."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def rasterize_mesh(verts, faces, image_size, patch=32, face_chunk=2048,
                   eps=1e-8):
    """Compute pix_to_face + zbuf for a batch of meshes.

    Args:
      verts: (B, V, 3) float — x, y in [-1, 1] (see convention above), z depth.
      faces: (F, 3) int32 — shared topology across the batch.
      image_size: int (square images).
      patch: static per-face candidate patch size in pixels. Faces whose
        bbox exceeds ``patch`` are rasterized partially (choose patch via
        ``required_patch_size`` for a given mesh family; FLAME @256 needs <32).
      face_chunk: faces processed per scan step (bounds transient memory).

    Returns:
      pix_to_face: (B, H, W) int32, -1 for background.
      zbuf: (B, H, W) float32, _BIG_Z where empty.

    Non-differentiable (wrapped in stop_gradient); pair with
    ``interpolate_face_attributes`` for the differentiable part.
    """
    verts = jax.lax.stop_gradient(verts)
    B, V, _ = verts.shape
    F = faces.shape[0]
    H = W = image_size

    # pad face count to a multiple of face_chunk with degenerate faces
    n_chunks = -(-F // face_chunk)
    pad = n_chunks * face_chunk - F
    faces_p = jnp.concatenate(
        [faces.astype(jnp.int32),
         jnp.zeros((pad, 3), jnp.int32)], axis=0) if pad else faces.astype(jnp.int32)
    valid_face = jnp.concatenate(
        [jnp.ones((F,), bool), jnp.zeros((pad,), bool)]) if pad else jnp.ones((F,), bool)
    faces_c = faces_p.reshape(n_chunks, face_chunk, 3)
    valid_c = valid_face.reshape(n_chunks, face_chunk)
    base_fid = (jnp.arange(n_chunks * face_chunk, dtype=jnp.int32)
                .reshape(n_chunks, face_chunk))

    # pixel coords of vertices
    px = (verts[..., 0] + 1) * (W / 2) - 0.5  # (B, V)
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    pz = verts[..., 2]

    ky, kx = jnp.meshgrid(jnp.arange(patch, dtype=jnp.int32),
                          jnp.arange(patch, dtype=jnp.int32), indexing='ij')
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)

    def candidates(chunk_faces, chunk_valid):
        """Per-candidate (pixel_index, z, inside) for one face chunk.

        Returns flat arrays over (B * face_chunk * patch^2).
        """
        f = chunk_faces  # (fc, 3)
        x0, x1, x2 = (px[:, f[:, 0]], px[:, f[:, 1]], px[:, f[:, 2]])  # (B, fc)
        y0, y1, y2 = (py[:, f[:, 0]], py[:, f[:, 1]], py[:, f[:, 2]])
        z0, z1, z2 = (pz[:, f[:, 0]], pz[:, f[:, 1]], pz[:, f[:, 2]])

        area = _edge(x0, y0, x1, y1, x2, y2)  # (B, fc)
        keep = (area > eps) & chunk_valid[None, :]

        xmin = jnp.ceil(jnp.minimum(jnp.minimum(x0, x1), x2)).astype(jnp.int32)
        ymin = jnp.ceil(jnp.minimum(jnp.minimum(y0, y1), y2)).astype(jnp.int32)
        cx = xmin[:, :, None] + kx[None, None, :]  # (B, fc, P*P)
        cy = ymin[:, :, None] + ky[None, None, :]
        fx = cx.astype(jnp.float32)
        fy = cy.astype(jnp.float32)

        w0 = _edge(x1[..., None], y1[..., None], x2[..., None], y2[..., None], fx, fy)
        w1 = _edge(x2[..., None], y2[..., None], x0[..., None], y0[..., None], fx, fy)
        w2 = _edge(x0[..., None], y0[..., None], x1[..., None], y1[..., None], fx, fy)
        inv_area = 1.0 / area[..., None]
        b0 = w0 * inv_area
        b1 = w1 * inv_area
        b2 = w2 * inv_area
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & keep[..., None]
        inside &= (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        z = b0 * z0[..., None] + b1 * z1[..., None] + b2 * z2[..., None]
        pix = cy * W + cx  # (B, fc, P*P)
        return pix, z, inside

    def zbuf_step(zbuf, args):
        chunk_faces, chunk_valid = args
        pix, z, inside = candidates(chunk_faces, chunk_valid)
        z = jnp.where(inside, z, _BIG_Z)
        pix = jnp.where(inside, pix, 0)
        zbuf = jax.vmap(lambda zb, p, v: zb.at[p].min(v))(
            zbuf, pix.reshape(B, -1), z.reshape(B, -1))
        return zbuf, None

    zbuf0 = jnp.full((B, H * W), _BIG_Z)
    zbuf, _ = jax.lax.scan(zbuf_step, zbuf0, (faces_c, valid_c))

    def fid_step(carry, args):
        fid_buf = carry
        chunk_faces, chunk_valid, fids = args
        pix, z, inside = candidates(chunk_faces, chunk_valid)
        zwin = jax.vmap(lambda zb, p: zb[p])(zbuf, pix.reshape(B, -1))
        flat_z = z.reshape(B, -1)
        # winner: z equals the buffered min exactly (same float computation)
        win = inside.reshape(B, -1) & (flat_z <= zwin)
        cand_fid = jnp.broadcast_to(fids[None, :, None],
                                    (B, fids.shape[0], patch * patch)).reshape(B, -1)
        cand_fid = jnp.where(win, cand_fid, jnp.int32(2 ** 30))
        fid_buf = jax.vmap(lambda fb, p, v: fb.at[p].min(v))(
            fid_buf, pix.reshape(B, -1), cand_fid)
        return fid_buf, None

    fid0 = jnp.full((B, H * W), 2 ** 30, jnp.int32)
    fid_buf, _ = jax.lax.scan(fid_step, fid0, (faces_c, valid_c, base_fid))

    pix_to_face = jnp.where(fid_buf >= 2 ** 30, -1, fid_buf).reshape(B, H, W)
    return pix_to_face, zbuf.reshape(B, H, W)


def rasterize_mesh_tiled(verts, faces, image_size, tile=8, capacity=448,
                         tile_chunk=32, eps=1e-8, coarse_k=None):
    """Dense tile-binned rasterizer — the TPU-native hot path.

    Same semantics as ``rasterize_mesh`` but with NO scatters: the image is
    partitioned into ``tile x tile`` pixel tiles; each tile keeps the
    ``capacity`` NEAREST overlapping faces (top_k on -z_min — FLAME side
    views stack >1000 faces in depth per tile, but only the nearest layer
    can be visible), then brute-force tests its pixels against that list and
    resolves visibility with an argmin over the capacity axis. Output
    assembly is a reshape (tiles partition the image), so the whole pipeline
    is dense VPU math that XLA tiles well.

    Approximation: a face is dropped only if ``capacity`` faces with smaller
    z_min overlap the tile. Highly slanted silhouette faces (small z_min far
    away, large z here) can evict a visible face in depth-stacked views; on
    FLAME at the default capacity this affects <=3 of 65k pixels in the worst
    (side) view — tests pin >=99.98% agreement with the exact scatter path,
    which remains available via impl='scatter'.

    Returns (pix_to_face (B, H, W) int32, zbuf (B, H, W) f32).
    """
    verts = jax.lax.stop_gradient(verts)
    B, V, _ = verts.shape
    F = faces.shape[0]
    H = W = image_size
    assert H % tile == 0, "image_size must be a multiple of tile"
    Tx = W // tile
    Ty = H // tile
    T = Tx * Ty
    capacity = min(capacity, F)
    faces = faces.astype(jnp.int32)

    px = (verts[..., 0] + 1) * (W / 2) - 0.5  # (B, V)
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    pz = verts[..., 2]

    fx = px[:, faces]  # (B, F, 3)
    fy = py[:, faces]
    fz = pz[:, faces]
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]
    area = _edge(x0, y0, x1, y1, x2, y2)  # (B, F)
    keep = area > eps  # front-facing, non-degenerate

    xmin = jnp.min(fx, -1)
    xmax = jnp.max(fx, -1)
    ymin = jnp.min(fy, -1)
    ymax = jnp.max(fy, -1)
    zmin = jnp.min(fz, -1)

    tile_y = (jnp.arange(T, dtype=jnp.float32) // Tx) * tile  # (T,)
    tile_x = (jnp.arange(T, dtype=jnp.float32) % Tx) * tile

    oy_pix, ox_pix = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                                  jnp.arange(tile, dtype=jnp.float32),
                                  indexing='ij')
    ox_pix = ox_pix.reshape(-1)
    oy_pix = oy_pix.reshape(-1)

    # ---- optional coarse pre-selection (coarse_k != None): nearest
    # coarse_k faces per 4x-tile so the per-fine-tile top_k sorts fewer
    # candidates. NOTE: measured SLOWER than single-level on v5e (the
    # per-chunk candidate-data gathers dominate) — kept for future tuning
    # with hoisted coarse gathers; default is single-level.
    two_level = coarse_k is not None
    coarse = tile * 4
    coarse_k = min(coarse_k, F) if two_level else F
    Tx1 = Tx // 4
    T1 = Tx1 * (Ty // 4)
    if two_level:
        c1_y = (jnp.arange(T1, dtype=jnp.float32) // Tx1) * coarse
        c1_x = (jnp.arange(T1, dtype=jnp.float32) % Tx1) * coarse
        ox1 = (xmin[:, None, :] <= c1_x[None, :, None] + (coarse - 1)) & \
              (xmax[:, None, :] >= c1_x[None, :, None])
        oy1 = (ymin[:, None, :] <= c1_y[None, :, None] + (coarse - 1)) & \
              (ymax[:, None, :] >= c1_y[None, :, None])
        overlap1 = ox1 & oy1 & keep[:, None, :]
        score1 = jnp.where(overlap1, -zmin[:, None, :], -jnp.inf)
        _, cand = jax.lax.top_k(score1, coarse_k)  # (B, T1, k1)
    else:
        cand = None

    # per fine tile: its parent's candidate list
    t_idx = jnp.arange(T)
    parent = (t_idx // Tx // 4) * Tx1 + (t_idx % Tx) // 4  # (T,)

    n_chunks = -(-T // tile_chunk)
    pad_t = n_chunks * tile_chunk - T
    tx_c = (jnp.pad(tile_x, (0, pad_t)) if pad_t else tile_x).reshape(
        n_chunks, tile_chunk)
    ty_c = (jnp.pad(tile_y, (0, pad_t)) if pad_t else tile_y).reshape(
        n_chunks, tile_chunk)
    par_c = (jnp.pad(parent, (0, pad_t)) if pad_t else parent).reshape(
        n_chunks, tile_chunk)

    def chunk_fn(_, args):
        cx, cy, par = args  # (Tc,) first pixel col/row + parent coarse tile
        if two_level:
            cnd = cand[:, par]  # (B, Tc, k1) candidate face ids
            cxmin = jnp.take_along_axis(xmin[:, None], cnd, axis=2)
            cxmax = jnp.take_along_axis(xmax[:, None], cnd, axis=2)
            cymin = jnp.take_along_axis(ymin[:, None], cnd, axis=2)
            cymax = jnp.take_along_axis(ymax[:, None], cnd, axis=2)
            ckeep = jnp.take_along_axis(keep[:, None], cnd, axis=2)
            czmin = jnp.take_along_axis(zmin[:, None], cnd, axis=2)
        else:
            cnd = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, None],
                                   (B, cx.shape[0], F))
            cxmin, cxmax = xmin[:, None], xmax[:, None]
            cymin, cymax = ymin[:, None], ymax[:, None]
            ckeep, czmin = keep[:, None], zmin[:, None]
        ox = (cxmin <= cx[None, :, None] + (tile - 1)) & \
             (cxmax >= cx[None, :, None])
        oy = (cymin <= cy[None, :, None] + (tile - 1)) & \
             (cymax >= cy[None, :, None])
        overlap = ox & oy & ckeep
        # nearest-K binning: prefer small z_min, ties -> lower candidate rank
        score = jnp.where(overlap, -czmin, -jnp.inf)
        _, k_id = jax.lax.top_k(score, capacity)            # (B, Tc, K)
        f_id = jnp.take_along_axis(cnd, k_id, axis=2)
        f_valid = jnp.take_along_axis(overlap, k_id, axis=2)

        gfx = jnp.take_along_axis(fx[:, None], f_id[..., None], axis=2)
        gfy = jnp.take_along_axis(fy[:, None], f_id[..., None], axis=2)
        gfz = jnp.take_along_axis(fz[:, None], f_id[..., None], axis=2)
        garea = jnp.take_along_axis(area[:, None], f_id, axis=2)

        pcx = cx[:, None] + ox_pix[None, :]  # (Tc, P)
        pcy = cy[:, None] + oy_pix[None, :]
        ax, ay = gfx[..., 0], gfy[..., 0]
        bx, by = gfx[..., 1], gfy[..., 1]
        cx3, cy3 = gfx[..., 2], gfy[..., 2]
        PX = pcx[None, :, :, None]
        PY = pcy[None, :, :, None]
        w0 = _edge(bx[:, :, None], by[:, :, None], cx3[:, :, None],
                   cy3[:, :, None], PX, PY)
        w1 = _edge(cx3[:, :, None], cy3[:, :, None], ax[:, :, None],
                   ay[:, :, None], PX, PY)
        w2 = _edge(ax[:, :, None], ay[:, :, None], bx[:, :, None],
                   by[:, :, None], PX, PY)
        inv_area = 1.0 / garea[:, :, None]
        inside = (w0 * inv_area >= 0) & (w1 * inv_area >= 0) & \
                 (w2 * inv_area >= 0) & f_valid[:, :, None, :]
        z = (w0 * gfz[..., 0][:, :, None] + w1 * gfz[..., 1][:, :, None]
             + w2 * gfz[..., 2][:, :, None]) * inv_area
        z = jnp.where(inside, z, _BIG_Z)
        best = jnp.argmin(z, axis=-1)  # (B, Tc, P)
        zbest = jnp.take_along_axis(z, best[..., None], axis=-1)[..., 0]
        fbest = jnp.take_along_axis(f_id, best, axis=2)
        pf = jnp.where(zbest < _BIG_Z, fbest, -1)
        return None, (pf, zbest)

    _, (pf_chunks, z_chunks) = jax.lax.scan(chunk_fn, None,
                                            (tx_c, ty_c, par_c))
    pf = pf_chunks.transpose(1, 0, 2, 3).reshape(B, n_chunks * tile_chunk, -1)
    zb = z_chunks.transpose(1, 0, 2, 3).reshape(B, n_chunks * tile_chunk, -1)
    pf = pf[:, :T].reshape(B, Ty, Tx, tile, tile)
    zb = zb[:, :T].reshape(B, Ty, Tx, tile, tile)
    pix_to_face = pf.transpose(0, 1, 3, 2, 4).reshape(B, H, W)
    zbuf = zb.transpose(0, 1, 3, 2, 4).reshape(B, H, W)
    return pix_to_face.astype(jnp.int32), zbuf


def required_tile_capacity(verts, faces, image_size, tile=16):
    """Host-side helper: max faces overlapping any tile (to validate
    ``capacity`` for a mesh family)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    H = W = image_size
    px = (verts[..., 0] + 1) * (W / 2) - 0.5
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    best = 0
    for b in range(verts.shape[0]):
        fx = px[b][faces]
        fy = py[b][faces]
        x0, x1, x2 = fx[:, 0], fx[:, 1], fx[:, 2]
        y0, y1, y2 = fy[:, 0], fy[:, 1], fy[:, 2]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        keep = area > 1e-8
        Tx = -(-W // tile)
        Ty = -(-H // tile)
        counts = np.zeros((Ty, Tx), np.int64)
        txmin = np.clip(np.floor(fx.min(1) / tile), 0, Tx - 1).astype(int)
        txmax = np.clip(np.floor(fx.max(1) / tile), 0, Tx - 1).astype(int)
        tymin = np.clip(np.floor(fy.min(1) / tile), 0, Ty - 1).astype(int)
        tymax = np.clip(np.floor(fy.max(1) / tile), 0, Ty - 1).astype(int)
        for f in np.nonzero(keep)[0]:
            counts[tymin[f]:tymax[f] + 1, txmin[f]:txmax[f] + 1] += 1
        best = max(best, int(counts.max()))
    return best


def interpolate_face_attributes(verts, faces, attributes, pix_to_face,
                                image_size, eps=1e-8):
    """Differentiable barycentric attribute interpolation.

    Args:
      verts: (B, V, 3) projected vertices (same space as rasterize_mesh).
      faces: (F, 3) int32.
      attributes: (B, F, 3, D) per-face per-corner attributes.
      pix_to_face: (B, H, W) from ``rasterize_mesh``.

    Returns:
      (B, D+1, H, W): interpolated attributes with the visibility/alpha mask
      appended as the last channel (matches the reference wrapper's output,
      renderer.py:425-440).
    """
    B, V, _ = verts.shape
    H = W = image_size
    D = attributes.shape[-1]
    F = faces.shape[0]

    mask = pix_to_face >= 0  # (B, H, W)
    fidx = jnp.where(mask, pix_to_face, 0).reshape(B, H * W)  # (B, HW)

    vx = (verts[..., 0] + 1) * (W / 2) - 0.5
    vy = (verts[..., 1] + 1) * (H / 2) - 0.5

    # ONE per-pixel row gather from a per-FACE table of
    # [corner x (3) | corner y (3) | corner attrs (3*D)]: building the
    # (B, F, 6+3D) table costs only B*F small gathers, and the per-pixel
    # lookup becomes a single wide-row take (three separate per-pixel
    # gathers — corner-x, corner-y, attrs — measured ~87 ms for the 4-view
    # batch-4 256^2 workload; fused ~3x less)
    tri = faces.astype(jnp.int32)  # (F, 3)
    cx = jnp.take(vx, tri.reshape(-1), axis=1).reshape(B, F, 3)
    cy = jnp.take(vy, tri.reshape(-1), axis=1).reshape(B, F, 3)
    table = jnp.concatenate(
        [cx, cy, attributes.reshape(B, F, 3 * D)], axis=-1)  # (B, F, 6+3D)
    rows_g = jnp.take_along_axis(
        table.reshape(B * F, 6 + 3 * D),
        (fidx + jnp.arange(B, dtype=fidx.dtype)[:, None] * F).reshape(-1)[
            :, None],
        axis=0).reshape(B, H * W, 6 + 3 * D)
    gx = rows_g[..., 0:3]
    gy = rows_g[..., 3:6]
    face_attrs = rows_g[..., 6:].reshape(B, H * W, 3, D)

    cols = jnp.arange(W, dtype=jnp.float32)
    rows = jnp.arange(H, dtype=jnp.float32)
    pcy, pcx = jnp.meshgrid(rows, cols, indexing='ij')
    pcx = pcx.reshape(1, H * W)
    pcy = pcy.reshape(1, H * W)

    w0 = _edge(gx[..., 1], gy[..., 1], gx[..., 2], gy[..., 2], pcx, pcy)
    w1 = _edge(gx[..., 2], gy[..., 2], gx[..., 0], gy[..., 0], pcx, pcy)
    w2 = _edge(gx[..., 0], gy[..., 0], gx[..., 1], gy[..., 1], pcx, pcy)
    area = _edge(gx[..., 0], gy[..., 0], gx[..., 1], gy[..., 1],
                 gx[..., 2], gy[..., 2])
    inv = 1.0 / jnp.where(jnp.abs(area) > eps, area, 1.0)
    bary = jnp.stack([w0 * inv, w1 * inv, w2 * inv], axis=-1)  # (B, HW, 3)

    vals = jnp.sum(bary[..., None] * face_attrs, axis=-2)  # (B, HW, D)
    vals = vals * mask.reshape(B, H * W, 1).astype(vals.dtype)

    out = vals.reshape(B, H, W, D).transpose(0, 3, 1, 2)
    alpha = mask.reshape(B, 1, H, W).astype(out.dtype)
    return jnp.concatenate([out, alpha], axis=1)


def rasterize_with_attributes(verts, faces, attributes, image_size,
                              patch=32, face_chunk=2048, impl='auto',
                              tile_capacity=320):
    """Full rasterizer: (B, D+1, H, W) attribute+alpha images.

    Equivalent to the reference's ``Pytorch3dRasterizer.forward``
    (renderer.py:401-440) for square images.

    impl:
      'auto'          — 'pallas_binned' on TPU (34x faster than 'tiled' on
                        v5e, exact binning), else 'tiled'.
      'pallas_binned' — sort-binned Pallas kernel (ops/pallas_raster.py).
      'tiled'         — dense XLA top_k binning (capacity heuristic).
      'pallas'        — sequential per-face Pallas z-buffer.
      'scatter'       — golden scatter-min path (slow, exact).
    """
    if impl == 'auto':
        on_tpu = jax.devices()[0].platform == 'tpu'
        impl = ('pallas_binned' if on_tpu and image_size % 32 == 0
                else 'tiled')
    if impl == 'pallas_binned' and image_size % 32 == 0:
        from ..ops.pallas_raster import rasterize_mesh_pallas_binned
        pix_to_face, _ = rasterize_mesh_pallas_binned(verts, faces,
                                                      image_size)
    elif impl == 'pallas':
        from ..ops.pallas_raster import rasterize_mesh_pallas
        pix_to_face, _ = rasterize_mesh_pallas(verts, faces, image_size,
                                               patch=patch)
    elif impl in ('tiled', 'pallas_binned') and image_size % 16 == 0:
        pix_to_face, _ = rasterize_mesh_tiled(verts, faces, image_size,
                                              capacity=tile_capacity)

    else:
        pix_to_face, _ = rasterize_mesh(verts, faces, image_size, patch=patch,
                                        face_chunk=face_chunk)
    return interpolate_face_attributes(verts, faces, attributes, pix_to_face,
                                       image_size)


def rasterize_uv_with_alpha(verts, faces, uv_attrs, image_size,
                            patch=32, face_chunk=2048, impl='auto',
                            tile_capacity=320):
    """(B, 3, H, W): (u, v, alpha) — the flagship's rasterization output.

    Semantically ``rasterize_with_attributes`` with D=2 attributes (the
    reference's face_uvcoords carry a constant-1 third channel that nothing
    consumes; the model reads channels [:2] for the texture grid and the
    alpha for masking — triplane_next3d.py:213-218). On TPU the
    'pallas_binned' path uses the UV-EMITTING kernel: the per-pixel
    attribute row gather + barycentric math of
    ``interpolate_face_attributes`` happens inside the rasterizer kernel
    while the candidate segment is already VMEM-resident, removing one
    full-image wide-row gather from the hot path. Other impls fall back to
    pix_to_face + interpolate.
    """
    if impl == 'auto':
        on_tpu = jax.devices()[0].platform == 'tpu'
        impl = ('pallas_binned' if on_tpu and image_size % 32 == 0
                else 'tiled')
    if impl in ('pallas_binned', 'pallas_binned16') and image_size % 32 == 0:
        if impl == 'pallas_binned16':
            # TILE=16 variant: ~4x less per-candidate VPU work (see
            # ops/pallas_raster.py); callers validate tile=16 occupancy
            from ..ops.pallas_raster import rasterize_mesh_pallas_binned_uv16
            pix_to_face, u, v = rasterize_mesh_pallas_binned_uv16(
                verts, faces, uv_attrs, image_size)
        else:
            from ..ops.pallas_raster import rasterize_mesh_pallas_binned_uv
            pix_to_face, u, v = rasterize_mesh_pallas_binned_uv(
                verts, faces, uv_attrs, image_size)
        alpha = (pix_to_face >= 0).astype(u.dtype)
        return jnp.stack([u, v, alpha], axis=1)
    ones = jnp.ones_like(uv_attrs[..., :1])
    out = rasterize_with_attributes(
        verts, faces, jnp.concatenate([uv_attrs, ones], axis=-1), image_size,
        patch=patch, face_chunk=face_chunk, impl=impl,
        tile_capacity=tile_capacity)  # (B, 4, H, W): (u, v, 1, alpha)
    return jnp.concatenate([out[:, :2], out[:, 3:]], axis=1)


def required_patch_size(verts, faces, image_size):
    """Max face bbox span in pixels (host-side helper to validate ``patch``)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    px = (verts[..., 0] + 1) * (image_size / 2)
    py = (verts[..., 1] + 1) * (image_size / 2)
    fx = px[..., faces]  # (B, F, 3)
    fy = py[..., faces]
    span = np.maximum(fx.max(-1) - fx.min(-1), fy.max(-1) - fy.min(-1))
    return float(span.max())
