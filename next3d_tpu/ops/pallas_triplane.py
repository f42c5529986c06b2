"""Pallas TPU kernel: fused tri-plane bilinear sampling over sample tiles.

The volume renderer gathers 4x3 bilinear taps for every (ray, depth) sample
from the 256^2 feature planes. This kernel reformulates the gather as MXU
matmuls over a plane slab held in VMEM (SURVEY 5.7's fused-render north
star): consecutive samples are COMPACT along one plane axis, so

    rows:  onehot_r (S, slab_h) @ slab (slab_h, W*C)       -> (S, W*C) [MXU]
    cols:  (tmp * repeat(onehot_c, C)) @ selector (W*C, C) -> (S, C)   [MXU]

One-hot taps use STRICT equality, so out-of-image taps contribute 0 —
exactly grid_sample's zeros padding.

Two residency modes:
- RESIDENT (slab_h=None, the default): the WHOLE plane lives in persistent
  VMEM scratch (8.4 MB f32 for 256^2 x 32ch) and is DMA'd once per plane —
  scratch survives the sequential TPU grid. No access-pattern constraint:
  hardware-validated EXACT (9.5e-7 at precision='highest') for frontal,
  yaw-0.6 and yaw-0.78 camera poses at the full render sample count.
- SLICED (integer slab_h): per tile, DMA only the slab_h rows the tile
  touches; for planes too large to reside (>= 512^2 x 32ch). A tile whose
  CONTRIBUTING row-span exceeds ~slab_h - 16 loses taps (they drop to
  zero — bounded error, never garbage). The span is pose-dependent: a
  full depth sweep moves plane-1 rows by sin(yaw)*1.05*(2/box_warp)*(W/2)
  px at the FFHQ rig, so slab 128 covers |yaw| <= ~0.33 rad.

MEASURED STATUS (v5e, clean single-job runs, 1.57M samples x 3 planes,
256^2 x 32ch): XLA's take_along_axis sampling path 257 ms; this kernel
1050 ms at 'highest' (3.8 s at DEFAULT-precision dots — the multi-pass
decomposition dominates). The one-hot formulation spends ~30 TFLOP on
what is fundamentally a gather, so it loses to XLA's native gather until
more work is fused behind the slab (decoder MLP + ray marcher — round-2).
It therefore ships as an OPT-IN experimental kernel
(rendering_kwargs['fused_plane_sampling']); the XLA path is the default.

ROUND-2 ADDENDUM — grouped-patch variant (`triplane_sample_grouped` +
`sample_from_planes_grouped` below): samples regrouped by (ray-tile x
depth-chunk) — a static transpose, no sort — so each 512-sample group
reads only small dynamically-anchored (patch_r, patch_c*C) windows of the
resident plane, with EXACT any-footprint coverage via disjoint multi-
window accumulation (see _interp_patch). Hardware-validated exact (7e-7
incl. steep poses and importance-like depths). Measured (v5e, B=4, 786k
render samples x 3 planes): 1130 ms vs 159 ms XLA — even with ~30x fewer
MACs than the full-width resident kernel, the one-hot matmul floor
(patch_area*C ~ 245k FLOP/sample) stays far above XLA's native gather
(~67 ns/sample*plane). CONCLUSION pinned for future rounds: matmul-based
gather emulation cannot win at C=32 on 256^2 planes at ANY patch size;
beating the XLA gather needs a true VPU gather (Mosaic lowers 2D
jnp.take_along_axis to tpu.dynamic_gather — axis-1, per-sublane) or a
different memory layout, not more matmul fusion.

Pitfall that cost a day: RESOURCE_EXHAUSTED from a remote-TPU run can be
HBM exhaustion of the WHOLE program (an oversized validation harness),
not kernel VMEM — earlier "VMEM OOM" conclusions about wide slabs were
exactly this. Bound the harness working set before blaming the kernel.

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


def _interp_chunks(rows_ref, cols_ref, out_ref, slab, r0, *, slab_rows,
                   samples, width, channels, precision, splits,
                   sub_chunk=128):
    """Bilinear one-hot matmul interpolation of a sample tile from `slab`.

    slab is a VMEM ref of (slab_rows, W*C); r0 is the plane row the slab's
    first row corresponds to. Data stays float32; the `precision` argument
    alone picks DEFAULT vs HIGHEST MXU passes. (A bf16-cast variant once
    appeared to raise VMEM pressure, but that experiment ran in a harness
    later found to exhaust HBM — re-evaluate bf16 storage in round 2.)
    """
    WC = width * channels
    # process samples in 128-row chunks (128-lane-aligned ref slices) via
    # fori_loop — optionally cut into sub_chunk pieces with STATIC value
    # slices (dynamic lane slices must be 128-aligned; static ones are
    # free), shrinking the (rows, W*C/splits) intermediates further.
    # Inside each piece the W*C axis is processed in `splits` segments
    # with an accumulator so the intermediates fit the VMEM budget
    # alongside the slab and matmul buffers.
    chunk = 128
    assert chunk % sub_chunk == 0
    seg = WC // splits
    wps = width // splits  # plane columns per segment
    sub = jax.lax.broadcasted_iota(jnp.int32, (sub_chunk, slab_rows), 1)
    w_of_s = jax.lax.broadcasted_iota(jnp.int32, (sub_chunk, seg), 1) \
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
        r_full = rows_ref[0, 0, pl.ds(off, chunk)] - r0.astype(jnp.float32)
        c_full = cols_ref[0, 0, pl.ds(off, chunk)]
        for piece in range(chunk // sub_chunk):
            r_k = r_full[piece * sub_chunk:(piece + 1) * sub_chunk]
            c_k = c_full[piece * sub_chunk:(piece + 1) * sub_chunk]
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

            def seg_body(s, acc, cl_k=cl_k, wc_k=wc_k, orow=orow):
                soff = pl.multiple_of(s * seg, seg)
                tmp = jnp.dot(orow, slab[:, pl.ds(soff, seg)],
                              preferred_element_type=jnp.float32,
                              precision=precision)
                cl_rel = cl_k - s * wps  # col index within this segment
                # a tap pair straddling a segment boundary resolves across
                # iterations: the low tap matches in segment s, the high
                # tap (cl_rel + 1 == wps) only in segment s + 1 at col 0
                ocr = ((w_of_s == cl_rel[:, None]).astype(jnp.float32)
                       * (1 - wc_k)[:, None]
                       + (w_of_s == (cl_rel + 1)[:, None]).astype(jnp.float32)
                       * wc_k[:, None])
                return acc + jnp.dot(tmp * ocr, sel_s,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

            ooff = pl.multiple_of(off + piece * sub_chunk, sub_chunk)
            out_ref[0, pl.ds(ooff, sub_chunk), :] = \
                jax.lax.fori_loop(0, splits, seg_body,
                                  jnp.zeros((sub_chunk, channels),
                                            jnp.float32))
        return 0

    jax.lax.fori_loop(0, samples // chunk, chunk_body, 0)


def _sample_kernel(rows_ref, cols_ref, planes_ref, out_ref, *,
                   tiles_per_plane, slab_h, samples, height, width, channels,
                   precision, splits):
    """Sliced-slab variant: per tile, DMA the slab_h rows the tile touches.
    rows/cols: (1, 1, S) f32 pixel coords; planes: (P, H, W*C) in ANY
    (HBM); out: (1, S, C)."""
    p = pl.program_id(0) // tiles_per_plane

    def body(slab, sem):
        r = rows_ref[0, 0, :]
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
        _interp_chunks(rows_ref, cols_ref, out_ref, slab, r0,
                       slab_rows=slab_h, samples=samples, width=width,
                       channels=channels, precision=precision, splits=splits)

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((slab_h, width * channels), planes_ref.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _sample_kernel_resident(rows_ref, cols_ref, planes_ref, out_ref,
                            slab, sem, *, tiles_per_plane, samples, height,
                            width, channels, precision, splits, reload_every):
    """Resident-plane variant: the WHOLE plane lives in VMEM scratch, DMA'd
    once per plane (scratch persists across the sequential TPU grid), so
    there is NO pose/row-span constraint and HBM traffic is one plane read
    per plane.

    reload_every: load on every grid step instead of only on the first tile
    of each plane — needed under interpret mode, where scratch does not
    reliably persist across grid steps.
    """
    i = pl.program_id(0)
    p = i // tiles_per_plane

    def load():
        dma = pltpu.make_async_copy(planes_ref.at[p, :, :], slab, sem)
        dma.start()
        dma.wait()

    if reload_every:
        load()
    else:
        pl.when(i % tiles_per_plane == 0)(load)
    # 64-sample pieces quarter the matmul intermediates so they fit beside
    # the full-plane slab
    _interp_chunks(rows_ref, cols_ref, out_ref, slab, jnp.int32(0),
                   slab_rows=height, samples=samples, width=width,
                   channels=channels, precision=precision, splits=splits,
                   sub_chunk=64)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def triplane_sample_tiles(planes_flat, rows, cols, channels, tile_samples=512,
                          slab_h=64, interpret=False, precision='bf16',
                          splits=None):
    """Fused bilinear sampling from plane slabs.

    Args:
      planes_flat: (P, H, W*C) planes; H is the compact (sliced) axis.
      rows, cols: (P, M) pixel coords; M % tile_samples == 0.
      slab_h: rows of plane resident per tile. None = RESIDENT mode — the
        whole plane is held in persistent VMEM scratch and DMA'd once per
        plane, removing the row-span constraint entirely; hardware-
        validated exact for all tested poses on 256^2 x 32ch planes. With
        an integer slab_h, samples must be grouped so each tile's row-span
        <= slab_h - 9 (the slab start is 8-aligned and the high bilinear
        tap needs one extra row); overflow taps drop to zero.
      precision: 'bf16' runs DEFAULT-precision (bf16 MXU passes) dots on
        float32 data; 'highest' runs full-float32 dots (exact, and
        currently also FASTER on v5e — see the module docstring).

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
    resident = slab_h is None
    slab_rows = H if resident else slab_h
    if splits is None:
        # wide slabs need the (chunk, W*C/splits) intermediates shrunk to
        # stay inside VMEM; segments must keep 128-lane alignment, so back
        # off the split count until (W*C/splits) % 128 == 0
        splits = 8 if resident else (4 if slab_rows > 128 else 2)
        while splits > 1 and not (W % splits == 0
                                  and (W // splits * C) % 128 == 0):
            splits //= 2
    assert W % splits == 0 and (W // splits * C) % 128 == 0
    if resident:
        kernel = functools.partial(_sample_kernel_resident, tiles_per_plane=T,
                                   samples=tile_samples, height=H, width=W,
                                   channels=C, precision=prec, splits=splits,
                                   reload_every=interpret)
        scratch = [pltpu.VMEM((H, WC), planes_flat.dtype),
                   pltpu.SemaphoreType.DMA]
    else:
        kernel = functools.partial(_sample_kernel, tiles_per_plane=T,
                                   slab_h=slab_h, samples=tile_samples,
                                   height=H, width=W, channels=C,
                                   precision=prec, splits=splits)
        scratch = []
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
        scratch_shapes=scratch,
        interpret=interpret,
    )(r_t, c_t, planes_flat)
    return out.reshape(P, M, C)


def _interp_patch(rows_ref, cols_ref, out_ref, slab, *, samples, height,
                  width, channels, patch_r, patch_c, precision,
                  max_win_r, max_win_c, sub_chunk=64):
    """Bilinear interpolation of one sample GROUP against dynamically
    positioned 2D windows of the VMEM-resident plane.

    Unlike `_interp_chunks` (row-anchored, full plane width), the group is
    expected to have a compact 2D footprint: the window anchor (r0, c0)
    comes from the group's contributing coordinates and the matmuls read a
    dynamically sliced (patch_r, patch_c*C) window of the resident plane —
    cutting one-hot matmul FLOPs by ~W/patch_c on top of the row
    factorization.

    EXACTNESS FOR ANY FOOTPRINT: one window cannot silently truncate —
    the group's bbox is covered by a grid of DISJOINT windows anchored at
    (r0 + jr*patch_r, c0 + jc*patch_c). Every bilinear tap lies in exactly
    one window (strict one-hot equality zeroes it elsewhere), so summing
    window contributions reproduces grid_sample exactly; windows beyond
    the group's measured span are skipped via `pl.when` at runtime. Typical
    render groups light up 1 window; steep-pose / importance-pass groups
    2-4 (see `group_footprint` for measuring a workload).
    """
    C = channels
    r = rows_ref[0, 0, :]
    c = cols_ref[0, 0, :]
    fH = jnp.float32(height)
    fW = jnp.float32(width)
    # anchor at the first CONTRIBUTING row/col (out-of-plane taps are zero
    # anyway; see _sample_kernel's anchor note)
    contrib_r = (r > -1.0) & (r < fH)
    contrib_c = (c > -1.0) & (c < fW)
    rmin = jnp.min(jnp.where(contrib_r, r, fH))
    cmin = jnp.min(jnp.where(contrib_c, c, fW))
    rmax = jnp.max(jnp.where(contrib_r, r, -fH))
    cmax = jnp.max(jnp.where(contrib_c, c, -fW))
    # sublane (8) / lane (128) alignment for the dynamic window slice
    calign = max(1, 128 // C)
    r0 = jnp.clip((jnp.floor(rmin).astype(jnp.int32) // 8) * 8,
                  0, height - patch_r)
    c0 = jnp.clip((jnp.floor(cmin).astype(jnp.int32) // calign) * calign,
                  0, width - patch_c)
    # windows = the partition cells [r0 + j*patch_r, r0 + (j+1)*patch_r) of
    # the row/col axes; count covers the highest tap (+1 for the bilinear
    # high tap). Window ANCHORS are clipped to the plane, but a tap's
    # window MEMBERSHIP uses the unclipped partition — clipped windows
    # reach past their cell only into out-of-plane territory, so the
    # membership mask keeps contributions disjoint and exact.
    n_r = (jnp.floor(rmax).astype(jnp.int32) + 1 - r0) // patch_r + 1
    n_c = (jnp.floor(cmax).astype(jnp.int32) + 1 - c0) // patch_c + 1

    PCC = patch_c * C
    sub = jax.lax.broadcasted_iota(jnp.int32, (sub_chunk, patch_r), 1)
    w_of_s = jax.lax.broadcasted_iota(jnp.int32, (sub_chunk, PCC), 1) // C
    ch_of = jax.lax.broadcasted_iota(jnp.int32, (PCC, C), 0) % C
    ch_id = jax.lax.broadcasted_iota(jnp.int32, (PCC, C), 1)
    sel = (ch_of == ch_id).astype(jnp.float32)

    chunk = 128
    assert samples % chunk == 0 and chunk % sub_chunk == 0

    def chunk_body(k, _):
        off = pl.multiple_of(k * chunk, chunk)
        r_full = rows_ref[0, 0, pl.ds(off, chunk)]
        c_full = cols_ref[0, 0, pl.ds(off, chunk)]
        for piece in range(chunk // sub_chunk):
            r_k = r_full[piece * sub_chunk:(piece + 1) * sub_chunk]
            c_k = c_full[piece * sub_chunk:(piece + 1) * sub_chunk]
            rl_f = jnp.floor(r_k)
            cl_f = jnp.floor(c_k)
            wr_k = r_k - rl_f
            wc_k = c_k - cl_f
            rl_g = rl_f.astype(jnp.int32)
            cl_g = cl_f.astype(jnp.int32)
            acc0 = jnp.zeros((sub_chunk, C), jnp.float32)

            ooff = pl.multiple_of(off + piece * sub_chunk, sub_chunk)
            out_ref[0, pl.ds(ooff, sub_chunk), :] = acc0

            # tap -> partition-cell indices (floor division; negative =
            # out-of-plane low taps, which belong to no window)
            pr_lo = (rl_g - r0) // patch_r
            pr_hi = (rl_g + 1 - r0) // patch_r
            pc_lo = (cl_g - c0) // patch_c
            pc_hi = (cl_g + 1 - c0) // patch_c

            for jr in range(max_win_r):
                for jc in range(max_win_c):
                    @pl.when((jr < n_r) & (jc < n_c))
                    def _(jr=jr, jc=jc, rl_g=rl_g, cl_g=cl_g, wr_k=wr_k,
                          wc_k=wc_k, ooff=ooff, pr_lo=pr_lo, pr_hi=pr_hi,
                          pc_lo=pc_lo, pc_hi=pc_hi):
                        wr0 = pl.multiple_of(
                            jnp.minimum(r0 + jr * patch_r,
                                        height - patch_r), 8)
                        wc0_px = jnp.minimum(c0 + jc * patch_c,
                                             width - patch_c)
                        wc0 = pl.multiple_of(wc0_px * C, 128)
                        rl_k = rl_g - wr0
                        cl_k = cl_g - wc0_px
                        m_rlo = (pr_lo == jr).astype(jnp.float32)
                        m_rhi = (pr_hi == jr).astype(jnp.float32)
                        m_clo = (pc_lo == jc).astype(jnp.float32)
                        m_chi = (pc_hi == jc).astype(jnp.float32)
                        orow = ((sub == rl_k[:, None]).astype(jnp.float32)
                                * ((1 - wr_k) * m_rlo)[:, None]
                                + (sub == (rl_k + 1)[:, None])
                                .astype(jnp.float32)
                                * (wr_k * m_rhi)[:, None])
                        tmp = jnp.dot(orow, slab[pl.ds(wr0, patch_r),
                                                 pl.ds(wc0, PCC)],
                                      preferred_element_type=jnp.float32,
                                      precision=precision)
                        ocr = ((w_of_s == cl_k[:, None]).astype(jnp.float32)
                               * ((1 - wc_k) * m_clo)[:, None]
                               + (w_of_s == (cl_k + 1)[:, None])
                               .astype(jnp.float32)
                               * (wc_k * m_chi)[:, None])
                        out_ref[0, pl.ds(ooff, sub_chunk), :] += jnp.dot(
                            tmp * ocr, sel,
                            preferred_element_type=jnp.float32,
                            precision=precision)
        return 0

    jax.lax.fori_loop(0, samples // chunk, chunk_body, 0)


def _sample_kernel_grouped(rows_ref, cols_ref, planes_ref, out_ref, slab,
                           sem, *, tiles_per_plane, samples, height, width,
                           channels, patch_r, patch_c, precision,
                           max_win_r, max_win_c, reload_every):
    """Resident-plane + per-group 2D patch windows (see _interp_patch)."""
    i = pl.program_id(0)
    p = i // tiles_per_plane

    def load():
        dma = pltpu.make_async_copy(planes_ref.at[p, :, :], slab, sem)
        dma.start()
        dma.wait()

    if reload_every:
        load()
    else:
        pl.when(i % tiles_per_plane == 0)(load)
    _interp_patch(rows_ref, cols_ref, out_ref, slab, samples=samples,
                  height=height, width=width, channels=channels,
                  patch_r=patch_r, patch_c=patch_c, precision=precision,
                  max_win_r=max_win_r, max_win_c=max_win_c)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def triplane_sample_grouped(planes_flat, rows, cols, channels, group=512,
                            patch_r=48, patch_c=96, interpret=False,
                            precision='highest'):
    """Grouped-patch fused sampling: samples arrive pre-grouped so that each
    consecutive `group` of them shares a small plane footprint; each group
    reads only a (patch_r, patch_c*C) window of the VMEM-resident plane.

    planes_flat: (P, H, W*C); rows/cols: (P, M) pixel coords with
    M % group == 0 and samples in group order (see group_render_coords).
    Returns (P, M, C) float32.
    """
    P, H, WC = planes_flat.shape
    C = channels
    W = WC // C
    M = rows.shape[1]
    assert M % group == 0 and group % 64 == 0
    assert patch_r % 8 == 0 and (patch_c * C) % 128 == 0
    assert patch_r <= H and patch_c <= W
    T = M // group
    r_t = rows.reshape(P * T, 1, group)
    c_t = cols.reshape(P * T, 1, group)
    prec = {'bf16': jax.lax.Precision.DEFAULT,
            'highest': jax.lax.Precision.HIGHEST}[precision]
    kernel = functools.partial(
        _sample_kernel_grouped, tiles_per_plane=T, samples=group, height=H,
        width=W, channels=C, patch_r=patch_r, patch_c=patch_c,
        precision=prec, max_win_r=H // patch_r + 1,
        max_win_c=W // patch_c + 1, reload_every=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(P * T,),
        in_specs=[
            pl.BlockSpec((1, 1, group), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, group, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P * T, group, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, WC), planes_flat.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(r_t, c_t, planes_flat)
    return out.reshape(P, M, C)


def _group_perm_shape(img_h, img_w, depths, tile_hw, depth_chunk):
    th, tw = tile_hw
    assert img_h % th == 0 and img_w % tw == 0 and depths % depth_chunk == 0
    return (img_h // th, th, img_w // tw, tw, depths // depth_chunk,
            depth_chunk)


def group_render_coords(x, img_h, img_w, depths, tile_hw=(8, 8),
                        depth_chunk=8):
    """(..., img_h*img_w*depths) sample axis -> group order
    (ray-tile x depth-chunk). A pure reshape/transpose — no sort, no gather.
    Group size = th*tw*depth_chunk. Trailing dims of x are preserved."""
    TH, th, TW, tw, SC, dc = _group_perm_shape(img_h, img_w, depths, tile_hw,
                                               depth_chunk)
    M = img_h * img_w * depths
    if x.shape[-1] == M:
        y = x.reshape(x.shape[:-1] + (TH, th, TW, tw, SC, dc))
        y = jnp.moveaxis(y, (-6, -4, -2, -5, -3, -1),
                         (-6, -5, -4, -3, -2, -1))
        return y.reshape(x.shape[:-1] + (M,))
    assert x.shape[-2] == M, (x.shape, M)
    trail = x.shape[-1]
    y = x.reshape(x.shape[:-2] + (TH, th, TW, tw, SC, dc, trail))
    y = jnp.moveaxis(y, (-7, -5, -3, -6, -4, -2),
                     (-7, -6, -5, -4, -3, -2))
    return y.reshape(x.shape[:-2] + (M, trail))


def ungroup_render_values(x, img_h, img_w, depths, tile_hw=(8, 8),
                          depth_chunk=8):
    """Inverse of group_render_coords on the samples axis (second-to-last
    when a trailing channel dim is present, else last)."""
    TH, th, TW, tw, SC, dc = _group_perm_shape(img_h, img_w, depths, tile_hw,
                                               depth_chunk)
    M = img_h * img_w * depths
    if x.shape[-1] == M:
        y = x.reshape(x.shape[:-1] + (TH, TW, SC, th, tw, dc))
        y = jnp.moveaxis(y, (-6, -5, -4, -3, -2, -1),
                         (-6, -4, -2, -5, -3, -1))
        return y.reshape(x.shape[:-1] + (M,))
    assert x.shape[-2] == M, (x.shape, M)
    trail = x.shape[-1]
    y = x.reshape(x.shape[:-2] + (TH, TW, SC, th, tw, dc, trail))
    y = jnp.moveaxis(y, (-7, -6, -5, -4, -3, -2),
                     (-7, -5, -3, -6, -4, -2))
    return y.reshape(x.shape[:-2] + (M, trail))


def plane_rows_cols(coordinates, box_warp, H, W):
    """(N, M, 3) world coords -> per-plane pixel (rows, cols), each
    (N*3, M), using the compact-axis convention of
    sample_from_planes_fused."""
    from ..render.renderer import project_onto_planes

    N, M, _ = coordinates.shape
    coords = (2 / box_warp) * coordinates
    proj = project_onto_planes(coords).reshape(N, 3, M, 2)
    px = (proj[..., 0] + 1) * (W / 2) - 0.5
    py = (proj[..., 1] + 1) * (H / 2) - 0.5
    rows = jnp.stack([py[:, 0], px[:, 1], py[:, 2]], axis=1)
    cols = jnp.stack([px[:, 0], py[:, 1], px[:, 2]], axis=1)
    return rows.reshape(N * 3, M), cols.reshape(N * 3, M)


def flatten_planes_compact(plane_features):
    """(N, 3, C, H, W) -> (N*3, H, W*C) with the per-plane compact axis
    first (plane 0/2: y rows; plane 1: x rows)."""
    N, n_planes, C, H, W = plane_features.shape
    f0 = plane_features[:, 0].transpose(0, 2, 3, 1)
    f1 = plane_features[:, 1].transpose(0, 3, 2, 1)
    f2 = plane_features[:, 2].transpose(0, 2, 3, 1)
    return jnp.stack([f0, f1, f2], axis=1).reshape(N * n_planes, H, W * C)


def group_footprint(coordinates, box_warp, H, W, img_h, img_w, depths,
                    tile_hw=(8, 8), depth_chunk=8):
    """Diagnostic: per-plane max (row_span, col_span) over all sample
    groups for a workload — row/col spans the patch must cover (plus the
    +1 bilinear tap and up-to-8/4 anchor alignment slack). Returns a
    (3, 2) numpy array."""
    rows, cols = plane_rows_cols(coordinates, box_warp, H, W)
    N3, M = rows.shape
    rows = group_render_coords(rows, img_h, img_w, depths, tile_hw,
                               depth_chunk)
    cols = group_render_coords(cols, img_h, img_w, depths, tile_hw,
                               depth_chunk)
    G = tile_hw[0] * tile_hw[1] * depth_chunk
    r = np.asarray(rows).reshape(N3 // 3, 3, M // G, G)
    c = np.asarray(cols).reshape(N3 // 3, 3, M // G, G)

    def span(a, size):
        contrib = (a > -1.0) & (a < size)
        lo = np.where(contrib, a, np.inf).min(-1)
        hi = np.where(contrib, a, -np.inf).max(-1)
        s = np.where(np.isfinite(lo), hi - lo, 0.0)
        return s.max(axis=(0, 2))

    return np.stack([span(r, H), span(c, W)], axis=-1)


def sample_from_planes_grouped(plane_features, coordinates, box_warp,
                               img_hw, depths, tile_hw=(8, 8), depth_chunk=8,
                               patch_r=48, patch_c=96, interpret=False,
                               precision='highest'):
    """Drop-in fast path for renderer.sample_from_planes for RENDER-pass
    coordinates, i.e. coords laid out ray-major over an (img_h, img_w) ray
    grid with `depths` samples per ray. Samples are regrouped by
    (ray-tile x depth-chunk) — a static transpose — so each kernel group
    touches only a small plane window.

    plane_features: (N, 3, C, H, W); coordinates: (N, M, 3) with
    M = img_h*img_w*depths. Returns (N, 3, M, C) float32 in the ORIGINAL
    sample order.
    """
    N, n_planes, C, H, W = plane_features.shape
    assert H == W, 'square planes'
    img_h, img_w = img_hw
    M = coordinates.shape[1]
    assert M == img_h * img_w * depths, (M, img_h, img_w, depths)
    rows, cols = plane_rows_cols(coordinates, box_warp, H, W)
    rows = group_render_coords(rows, img_h, img_w, depths, tile_hw,
                               depth_chunk)
    cols = group_render_coords(cols, img_h, img_w, depths, tile_hw,
                               depth_chunk)
    planes_flat = flatten_planes_compact(plane_features)
    group = tile_hw[0] * tile_hw[1] * depth_chunk
    out = triplane_sample_grouped(planes_flat, rows, cols, C, group=group,
                                  patch_r=patch_r, patch_c=patch_c,
                                  interpret=interpret, precision=precision)
    out = ungroup_render_values(out, img_h, img_w, depths, tile_hw,
                                depth_chunk)
    return out.reshape(N, n_planes, M, C)


def sample_from_planes_fused(plane_features, coordinates, box_warp,
                             tile_samples=512, slab_h=None, interpret=False,
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
