"""A/B gather formulations for the tri-plane sampling hot spot.

The stage profile (docs/STAGE_PROFILE.md) pins the 2x2-packed row gather at
~82 ms per render pass (batch 8: 1.57M samples x 3 planes from 256^2 x 128ch
bf16 tables, ~17 ns/row). Each variant below computes the SAME gather; we
rank them on-chip, then confirm the winner end-to-end with bench.py
(measurement discipline: varied inputs per call, one dispatch per iter).

Variants:
  batched   jnp.take_along_axis on (B, HW, C) tables        [current prod]
  flat      single take() from (B*HW, C) with flat indices
  flat_pib  same, mode='promise_in_bounds' via lax.gather
  onedim    gather of (B*HW*C,) viewed rows? (expected slow; sanity)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 24            # N*3 planes (batch 8)
HW = 256 * 256
C = 128           # 4C packed channels
M = 196608        # samples per plane per pass
DTYPE = jnp.bfloat16
ITERS = int(os.environ.get('ITERS', '16'))


def mk_inputs(eps):
    k = jax.random.fold_in(jax.random.PRNGKey(0), (eps * 1e6).astype(jnp.int32))
    k1, k2 = jax.random.split(k)
    table = jax.random.normal(k1, (B, HW, C), jnp.float32).astype(DTYPE)
    idx = jax.random.randint(k2, (B, M), 0, HW, jnp.int32)
    return table, idx


def v_batched(eps):
    table, idx = mk_inputs(eps)
    return jnp.take_along_axis(table, idx[..., None], axis=1)


def v_flat(eps):
    table, idx = mk_inputs(eps)
    flat = table.reshape(B * HW, C)
    fidx = (idx + (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]).reshape(-1)
    return jnp.take(flat, fidx, axis=0).reshape(B, M, C)


def v_flat_pib(eps):
    table, idx = mk_inputs(eps)
    flat = table.reshape(B * HW, C)
    fidx = (idx + (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]).reshape(-1)
    out = jax.lax.gather(
        flat, fidx[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, C), mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out.reshape(B, M, C)


def v_tak_pib(eps):
    table, idx = mk_inputs(eps)
    return jnp.take_along_axis(table, idx[..., None], axis=1,
                               mode='promise_in_bounds')


def v_dma(tile, depth):
    """Per-row DMA ring (ops/pallas_dma_gather.py) — pinned NEGATIVE:
    ~353 ns/descriptor at best (depth 128), ~31x the XLA gather rate."""
    from next3d_tpu.ops.pallas_dma_gather import dma_gather_row_blocks

    def fn(eps):
        table, idx = mk_inputs(eps)
        flat = table.reshape(B * HW, C)
        fidx = (idx + (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]
                ).reshape(-1)
        blocks = dma_gather_row_blocks(flat, fidx, tile, depth)
        return jnp.take_along_axis(
            blocks, (fidx % 8)[:, None, None], axis=1)[:, 0].reshape(B, M, C)
    return fn


def probe(name, fn):
    f = jax.jit(fn)
    out = f(jnp.float32(0.5))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:12s} {dt * 1000:8.2f} ms   ({dt / (B * M) * 1e9:.1f} ns/row)',
          flush=True)


if __name__ == '__main__':
    print(f'device={jax.devices()[0]} table=({B},{HW},{C}) {DTYPE.__name__} '
          f'M={M}', flush=True)
    # include the input derivation cost once for reference
    probe('inputs_only', lambda e: mk_inputs(e)[1])
    variants = [('batched', v_batched), ('flat', v_flat),
                ('flat_pib', v_flat_pib), ('tak_pib', v_tak_pib)]
    if os.environ.get('DMA', '0') == '1':
        variants = [('flat_pib', v_flat_pib)]
        for tile in (1024, 4096):
            for depth in (64, 128):
                variants.append((f'dma_t{tile}_d{depth}', v_dma(tile, depth)))
    for name, fn in variants:
        probe(name, fn)
