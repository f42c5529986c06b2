"""Pallas TPU kernel: row gather driven by per-row async DMA copies.

The tri-plane / texture sampling hot spot is a row gather (one (4C)-channel
row per bilinear sample from a 2x2-packed table; render/renderer.py and
ops/grid_sample.py). Every XLA-issued formulation measured in rounds 3-4
bottoms out at ~11.5 ns/row independent of index locality and row width
(docs/STAGE_PROFILE.md) — an instruction-issue floor. This module builds
the ONE mechanism not previously measured (VERDICT r4 next-step #1a): a
kernel that issues its own HBM->VMEM `pltpu.make_async_copy` per row with
a ring of outstanding DMAs, so the copy engine streams rows while the
scalar core runs ahead issuing descriptors.

Two Mosaic lowering facts shape the kernel:
  * single arbitrary rows of a tiled HBM ref are NOT sliceable — dim-0
    slices must be 8-aligned ("Slice shape along dimension 0 must be
    aligned to tiling (8)"), and 1-D views need 1024-element alignment;
    so the kernel fetches the aligned 8-row BLOCK containing each index
    (2 KB for a 128ch bf16 table). That overfetch does not disturb the
    measurement: the quantity under test is descriptor issue/retire rate,
    and HBM bandwidth never becomes the binding constraint (see numbers).
  * DMA semaphore arrays deeper than ~128 slots collapse (measured below).

MEASURED (v5e, 131072 descriptors from a (98304, 128) bf16 table,
value-fetched per iteration, 2026-08-19):

    ring depth 16,  tile 1024:   9928 ns/descriptor   (latency-bound)
    ring depth 64,  tile 1024:    516 ns/descriptor
    ring depth 128, tile 4096:    353 ns/descriptor   (best)
    ring depth 256, tile 4096: 206097 ns/descriptor   (semaphore thrash)

Best case is ~31x SLOWER than the XLA gather's 11.5 ns/row, at 6 GB/s
effective — nowhere near bandwidth-bound. The per-descriptor scalar-core
cost (SMEM index load, address arithmetic, descriptor write, semaphore
wait bookkeeping) is hundreds of ns, vs the ~11 scalar-cycle budget XLA's
native gather achieves per row. With this, ALL known TPU row-gather
mechanisms are pinned:

  * XLA native gather (flat 1-D rows, PROMISE_IN_BOUNDS): 11.5 ns/row —
    production (ops/grid_sample.py).
  * MXU one-hot matmul emulation: ~4-13x slower (ops/pallas_triplane.py).
  * In-VMEM tpu.dynamic_gather: refused by Mosaic for >128-lane tables.
  * Per-row DMA pipeline (this file): ~31x slower, descriptor-rate bound.

The 11.5 ns/row floor is therefore load-bearing: the volume-gather stage
is irreducible at fixed sample count on this hardware generation, and the
remaining levers are fewer rows (sample-count knobs, not parity) or
overlapping the gather with other work.

The kernel is kept (a) as the measurement artifact backing that claim and
(b) because per-descriptor DMA IS the right mechanism for bulk-row
gathers (few indices, kilobytes per row) where one descriptor amortizes —
at 2 KB/descriptor the ring already moves 6 GB/s; at >= 32 KB/row it
would approach HBM bandwidth, which the XLA gather's fixed row rate
cannot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref, sems, *, tile, depth):
    """Gather the aligned 8-row block around each index via a DMA ring."""

    def get_dma(j):
        # Mosaic constraint: HBM dim-0 slices must be 8-aligned
        row8 = (idx_ref[j] // 8) * 8
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row8, 8), :], out_ref.at[j],
            sems.at[jax.lax.bitwise_and(j, depth - 1)])

    def warm(j, _):
        get_dma(j).start()
        return 0
    jax.lax.fori_loop(0, depth, warm, 0)

    def body(j, _):
        get_dma(j).wait()

        @pl.when(j + depth < tile)
        def _():
            get_dma(j + depth).start()
        return 0
    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dma_gather_row_blocks(table, idx, tile=4096, depth=128,
                          interpret=False):
    """out[i] = table[8*(idx[i]//8) : 8*(idx[i]//8)+8] via per-index DMAs.

    Args:
      table: (R, C) array, R % 8 == 0; blocks are DMA'd from HBM.
      idx: (M,) int32 row indices, M % tile == 0.
      tile: indices per grid step (the idx block rides in SMEM; must keep
        the s32 layout quantum, i.e. a multiple of 1024).
      depth: outstanding DMAs (power of two; ring of semaphores). Measured
        sweet spot 128 — deeper rings collapse (module docstring).

    Returns: (M, 8, C) gathered aligned blocks; row idx[i] is
      out[i, idx[i] % 8].
    """
    R, C = table.shape
    M = idx.shape[0]
    # the s32 SMEM layout quantum (1024) binds only in compiled mode
    assert M % tile == 0 and (interpret or tile % 1024 == 0), (M, tile)
    assert depth & (depth - 1) == 0, depth
    assert R % 8 == 0, R
    kernel = functools.partial(_gather_kernel, tile=tile, depth=depth)
    return pl.pallas_call(
        kernel,
        grid=(M // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, 8, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 8, C), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)
