"""Pallas TPU kernel: fused tri-plane bilinear sampling over sample tiles.

The volume renderer gathers 4x3 bilinear taps for every (ray, depth) sample
from the 256^2 feature planes. This kernel reformulates the gather as MXU
matmuls over a plane slab held in VMEM (SURVEY 5.7's fused-render north
star): consecutive samples are COMPACT along one plane axis, so

    rows:  onehot_r (S, slab_h) @ slab (slab_h, W*C)       -> (S, W*C) [MXU]
    cols:  (tmp * repeat(onehot_c, C)) @ selector (W*C, C) -> (S, C)   [MXU]

One-hot taps use STRICT equality, so out-of-image taps contribute 0 —
exactly grid_sample's zeros padding.

Residency: the WHOLE plane lives in persistent VMEM scratch (8.4 MB f32
for 256^2 x 32ch) and is DMA'd once per plane — scratch survives the
sequential TPU grid. No access-pattern constraint: hardware-validated
EXACT (9.5e-7 at precision='highest') for frontal, yaw-0.6 and yaw-0.78
camera poses at the full render sample count.

MEASURED STATUS (v5e, clean single-job runs, 1.57M samples x 3 planes,
256^2 x 32ch): XLA's take_along_axis sampling path 257 ms; this kernel
1050 ms at 'highest' (3.8 s at DEFAULT-precision dots — the multi-pass
decomposition dominates). The one-hot formulation spends ~30 TFLOP on
what is fundamentally a gather, so it loses to XLA's native gather.
It therefore ships as an OPT-IN experimental kernel
(rendering_kwargs['fused_plane_sampling']); the XLA path is the default.

CONCLUSION pinned across rounds 2-3 (two pruned variants measured it
out: a sliced-slab mode DMA-ing only the rows a tile touches, and a
grouped-patch mode reading small dynamically-anchored 2D windows —
1130 ms vs 159 ms XLA even at ~30x fewer MACs): matmul-based gather
emulation cannot win at C=32 on 256^2 planes at ANY patch size — the
one-hot matmul floor (patch_area*C FLOP/sample) stays far above XLA's
native gather (~67 ns/sample*plane). Beating the XLA gather would need a
true VPU gather over a VMEM-resident table; round 3 built one on
tpu.dynamic_gather and hardware REFUSED it: Mosaic lowers dynamic_gather
as a single-vreg lane shuffle — "Multiple source vregs along gather
dimension" for any table wider than 128 lanes (and 32-bit indices require
32-bit data), so a 256x256=65536-entry plane table can never be indexed
in-kernel by this primitive, with any dtype or channel grouping. Both
in-kernel gather formulations (MXU one-hot matmul, VPU dynamic_gather)
are therefore pinned dead ends on this toolchain; XLA's native gather on
2x2-packed rows (render/renderer.py sample_from_planes) is the production
tri-plane sampling path.

Pitfall that cost a day: RESOURCE_EXHAUSTED from a remote-TPU run can be
HBM exhaustion of the WHOLE program (an oversized validation harness),
not kernel VMEM — earlier "VMEM OOM" conclusions about wide slabs were
exactly this. Bound the harness working set before blaming the kernel.

Layout: planes are flattened to (P, H_compact, W*C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def triplane_sample_tiles(planes_flat, rows, cols, channels, tile_samples=512,
                          interpret=False, precision='bf16', splits=None):
    """Fused bilinear sampling from VMEM-resident planes.

    Args:
      planes_flat: (P, H, W*C) planes; H is the compact axis.
      rows, cols: (P, M) pixel coords; M % tile_samples == 0.
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
    if splits is None:
        # the full-plane slab needs the (chunk, W*C/splits) intermediates
        # shrunk to stay inside VMEM; segments must keep 128-lane
        # alignment, so back off the split count until (W*C/splits) % 128
        # == 0
        splits = 8
        while splits > 1 and not (W % splits == 0
                                  and (W // splits * C) % 128 == 0):
            splits //= 2
    assert W % splits == 0 and (W // splits * C) % 128 == 0
    kernel = functools.partial(_sample_kernel_resident, tiles_per_plane=T,
                               samples=tile_samples, height=H, width=W,
                               channels=C, precision=prec, splits=splits,
                               reload_every=interpret)
    scratch = [pltpu.VMEM((H, WC), planes_flat.dtype),
               pltpu.SemaphoreType.DMA]
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


def sample_from_planes_fused(plane_features, coordinates, box_warp,
                             tile_samples=512, interpret=False,
                             precision='bf16', splits=None):
    """Drop-in fast path for render.renderer.sample_from_planes.

    plane_features: (N, 3, C, H, W); coordinates: (N, M, 3) -> (N, 3, M, C).

    Per plane, the axis NOT swept by depth is chosen as the compact
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
                                tile_samples=tile_samples,
                                interpret=interpret, precision=precision,
                                splits=splits)
    return out[:, :M].reshape(N, n_planes, M, C)
