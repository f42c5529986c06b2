"""Pallas TPU kernel: fused tri-plane bilinear sampling over sample tiles.

The volume renderer's dominant cost is gathering 4x3 bilinear taps for every
(ray, depth) sample from the 256^2 feature planes — XLA lowers this to
row-gathers that run ~100x below HBM speed-of-light. This kernel exploits
the renderer's structure (SURVEY 5.7's fused-render north star): consecutive
samples are COMPACT along one plane axis (rays move slowly; depth sweeps the
other axis), so each tile of samples needs only a SLAB of the plane in VMEM
and the bilinear interpolation becomes MXU matmuls:

    rows:  onehot_r (S, slab_h) @ slab (slab_h, W*C)       -> (S, W*C) [MXU]
    cols:  (tmp * repeat(onehot_c, C)) @ selector (W*C, C) -> (S, C)   [MXU]

One-hot taps use STRICT equality, so out-of-image taps contribute 0 —
exactly grid_sample's zeros padding. The only approximation is slab-height
overflow (a tile whose CONTRIBUTING row-span exceeds ~slab_h - 16 loses
taps); the XLA path stays the default-correct reference and tests validate
agreement on the renderer's access patterns.

Exact-pose domain: a full depth sweep is contiguous in the sample order, so
every tile contains whole sweeps and the binding span is the per-ray one.
For plane 1 (rows = x) under the FFHQ camera rig (radius 2.7, depth range
1.05, box_warp 1, W 256) the depth sweep moves x by sin(yaw)*1.05*256 px —
~152 px at yaw 0.6, up to 269 px at a full 90-deg profile — plus ~23 px of
intra-tile ray spread at 128 rays/row with 1024-sample tiles. The slab
therefore bounds an exact-POSE cone: slab 128 covers |yaw| <= ~0.33 rad
(sin(yaw)*269 + 23 + 16 <= 128) — the frontal/near-frontal regime of
bench, gen_samples and gen_videos orbits; FFHQ training poses out to ~53
deg need slab ~248, which does NOT fit VMEM today: slabs of 184-248 rows
ResourceExhaust even with the W*C intermediates split 8-way, while 128
fits easily — consistent with the Mosaic dot padding its K dimension
(slab_h) to a 128-multiple via a padded slab copy, making {64, 128} the
viable fp32 slab heights. Round-2 item: store the slab in bf16 for the
bf16 path (halves slab VMEM and DMA, making a 256-row slab ~4.2MB). Past the cone, overflow taps drop to zero (bounded error,
never garbage); use the default XLA path for wide-pose training. Exactness
evidence: hardware 'highest' exact (7e-7) at (512, 64) frontal; CPU
interpret per-pose breakdown exact at slab 128 for frontal items at a
4x-harsher intra-tile spread than the real 128 rays/row.

Layout: planes are flattened to (P, H_compact, W*C); the compact axis is
sliced with an 8-aligned dynamic offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_kernel(rows_ref, cols_ref, planes_ref, out_ref, *,
                   tiles_per_plane, slab_h, samples, height, width, channels,
                   precision, splits):
    """rows/cols: (1, 1, S) f32 pixel coords; planes: (P, H, W*C) in ANY
    (HBM); out: (1, S, C)."""
    p = pl.program_id(0) // tiles_per_plane
    WC = width * channels

    def body(slab, sem):
        r = rows_ref[0, 0, :]
        c = cols_ref[0, 0, :]
        # anchor the slab at the first CONTRIBUTING row: rows outside
        # (-1, H) produce zero taps anyway, and letting them drag the anchor
        # down wastes slab coverage on rows no sample reads (real camera
        # tiles mix in-box and out-of-box depth samples)
        contrib = (r > -1.0) & (r < jnp.float32(height))
        rmin = jnp.min(jnp.where(contrib, r, jnp.float32(height)))
        r0 = jnp.floor(rmin).astype(jnp.int32)
        # height - slab_h must stay 8-aligned for the hint to hold
        r0 = pl.multiple_of(jnp.clip((r0 // 8) * 8, 0, height - slab_h), 8)

        dma = pltpu.make_async_copy(
            planes_ref.at[p, pl.ds(r0, slab_h), :], slab, sem)
        dma.start()

        dma.wait()
        # process samples in 128-row chunks (128-lane-aligned ref slices)
        # via fori_loop; inside each chunk the W*C axis is processed in
        # `splits` segments with an accumulator so the (chunk, W*C/splits)
        # intermediates fit the 16 MB VMEM budget alongside the matmul
        # buffers — splits=4 frees enough room for wide-pose slabs
        chunk = 128
        seg = WC // splits
        wps = width // splits  # plane columns per segment
        sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, slab_h), 1)
        w_of_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, seg), 1) \
            // channels
        # selector for one segment: sel_s[w*C + ch, ch] = 1
        ch_of = jax.lax.broadcasted_iota(jnp.int32, (seg, channels), 0) \
            % channels
        ch_id = jax.lax.broadcasted_iota(jnp.int32, (seg, channels), 1)
        sel_s = (ch_of == ch_id).astype(jnp.float32)

        def chunk_body(k, _):
            off = pl.multiple_of(k * chunk, chunk)
            # slice coords from the REFS (value dynamic_slice is not
            # supported by the Mosaic lowering)
            r_k = rows_ref[0, 0, pl.ds(off, chunk)] - r0.astype(jnp.float32)
            c_k = cols_ref[0, 0, pl.ds(off, chunk)]
            rl_f = jnp.floor(r_k)
            cl_f = jnp.floor(c_k)
            wr_k = r_k - rl_f
            wc_k = c_k - cl_f
            rl_k = rl_f.astype(jnp.int32)
            cl_k = cl_f.astype(jnp.int32)
            # row one-hots (strict equality: out-of-slab taps vanish)
            orow = ((sub == rl_k[:, None]).astype(jnp.float32)
                    * (1 - wr_k)[:, None]
                    + (sub == (rl_k + 1)[:, None]).astype(jnp.float32)
                    * wr_k[:, None])

            def seg_body(s, acc):
                soff = pl.multiple_of(s * seg, seg)
                tmp = jnp.dot(orow, slab[:, pl.ds(soff, seg)],
                              preferred_element_type=jnp.float32,
                              precision=precision)
                cl_rel = cl_k - s * wps  # col index within this segment
                # a tap pair straddling a segment boundary resolves across
                # iterations: the low tap matches in segment s, the high tap
                # (cl_rel + 1 == wps) only in segment s + 1 where it is col 0
                ocr = ((w_of_s == cl_rel[:, None]).astype(jnp.float32)
                       * (1 - wc_k)[:, None]
                       + (w_of_s == (cl_rel + 1)[:, None]).astype(jnp.float32)
                       * wc_k[:, None])
                return acc + jnp.dot(tmp * ocr, sel_s,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

            out_ref[0, pl.ds(off, chunk), :] = jax.lax.fori_loop(
                0, splits, seg_body, jnp.zeros((chunk, channels), jnp.float32))
            return 0

        jax.lax.fori_loop(0, samples // chunk, chunk_body, 0)

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((slab_h, width * channels), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def triplane_sample_tiles(planes_flat, rows, cols, channels, tile_samples=512,
                          slab_h=64, interpret=False, precision='bf16',
                          splits=None):
    """Fused bilinear sampling from plane slabs.

    Args:
      planes_flat: (P, H, W*C) planes; H is the compact (sliced) axis.
      rows, cols: (P, M) pixel coords; M % tile_samples == 0; samples must
        be grouped so each tile's row-span <= slab_h - 9 (the slab start is
        8-aligned and the high bilinear tap needs one extra row); overflow
        taps drop to zero.

    Returns: (P, M, C) float32 samples (zeros padding semantics built in).
    """
    P, H, WC = planes_flat.shape
    C = channels
    W = WC // C
    M = rows.shape[1]
    assert M % tile_samples == 0
    T = M // tile_samples
    r_t = rows.reshape(P * T, 1, tile_samples)
    c_t = cols.reshape(P * T, 1, tile_samples)

    # NOTE: the Mosaic lowering supports only DEFAULT (bf16 passes) and
    # HIGHEST (full fp32) dot precisions
    prec = {'bf16': jax.lax.Precision.DEFAULT,
            'highest': jax.lax.Precision.HIGHEST}[precision]
    if splits is None:
        # wide slabs need the (chunk, W*C/splits) intermediates shrunk to
        # stay inside VMEM; segments must keep 128-lane alignment
        splits = 4 if slab_h > 128 else 2
    assert W % splits == 0 and (W // splits * C) % 128 == 0
    kernel = functools.partial(_sample_kernel, tiles_per_plane=T,
                               slab_h=slab_h, samples=tile_samples,
                               height=H, width=W, channels=C,
                               precision=prec, splits=splits)
    out = pl.pallas_call(
        kernel,
        grid=(P * T,),
        in_specs=[
            pl.BlockSpec((1, 1, tile_samples), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_samples), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile_samples, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P * T, tile_samples, C), jnp.float32),
        interpret=interpret,
    )(r_t, c_t, planes_flat)
    return out.reshape(P, M, C)


def sample_from_planes_fused(plane_features, coordinates, box_warp,
                             tile_samples=512, slab_h=64, interpret=False,
                             precision='bf16', splits=None):
    """Drop-in fast path for render.renderer.sample_from_planes.

    plane_features: (N, 3, C, H, W); coordinates: (N, M, 3) -> (N, 3, M, C).

    Per plane, the axis NOT swept by depth is chosen as the compact (sliced)
    axis: plane 0 (proj x,y) -> y rows; plane 1 (proj x,z) -> x rows;
    plane 2 (proj z,y) -> y rows.
    """
    from ..render.renderer import project_onto_planes

    N, n_planes, C, H, W = plane_features.shape
    assert H == W, 'square planes'
    M = coordinates.shape[1]
    coords = (2 / box_warp) * coordinates
    proj = project_onto_planes(coords).reshape(N, n_planes, M, 2)
    px = (proj[..., 0] + 1) * (W / 2) - 0.5   # image x == cols
    py = (proj[..., 1] + 1) * (H / 2) - 0.5   # image y == rows

    feats = plane_features
    # arrange (compact, other, C) then flatten (compact, other*C)
    f0 = feats[:, 0].transpose(0, 2, 3, 1)  # (N, H, W, C): compact y
    f1 = feats[:, 1].transpose(0, 3, 2, 1)  # (N, W, H, C): compact x
    f2 = feats[:, 2].transpose(0, 2, 3, 1)  # compact y
    planes_flat = jnp.stack([f0, f1, f2], axis=1).reshape(
        N * n_planes, H, W * C)

    rows = jnp.stack([py[:, 0], px[:, 1], py[:, 2]], axis=1)
    cols = jnp.stack([px[:, 0], py[:, 1], px[:, 2]], axis=1)
    rows = rows.reshape(N * n_planes, M)
    cols = cols.reshape(N * n_planes, M)

    pad = (-M) % tile_samples
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)), constant_values=-10.0)
        cols = jnp.pad(cols, ((0, 0), (0, pad)), constant_values=-10.0)
    out = triplane_sample_tiles(planes_flat, rows, cols, C,
                                tile_samples=tile_samples, slab_h=slab_h,
                                interpret=interpret, precision=precision,
                                splits=splits)
    return out[:, :M].reshape(N, n_planes, M, C)
