"""Microbenchmark: Mosaic tpu.dynamic_gather (in-Pallas take_along_axis)
throughput on VMEM-resident tables, vs the XLA HBM row-gather baseline.

The round-2 pinned conclusion (ops/pallas_triplane.py docstring) is that
matmul-based gather emulation cannot beat XLA's native gather at C=32, and
that the path forward is a true VPU gather: Mosaic lowers 2D
``jnp.take_along_axis`` (indices shaped like the table) to
``tpu.dynamic_gather``. This tool measures what that op actually costs on
hardware for the layouts a fused tri-plane sampler could use:

  A. lane-gather, table (32, 128): one vreg-column window per channel
     group — the per-group windowed design. out[c, s] = win[c, idx[s]].
  B. lane-gather, table (32, 512): 4-vreg window (lowering must decompose).
  C. lane-gather, table (32, 65536): whole flattened 256^2 plane along
     lanes (if this is fast, no windowing is needed at all).
  D. sublane-gather, table (256, 8192): whole plane as (H, W*C), gathering
     full rows by y index.

Protocol: each timed call derives indices on-device from a fresh host
scalar (the axon client dedups identical dispatches; memory: microbenches
lie unless inputs vary). Report ns per gathered (sample x channel-group)
and the implied time for the flagship workload (9.4M row-gathers/frame
batch, 2 passes).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(jnp.float32(0.5), *args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(jnp.float32(0.1 + 0.8 * np.random.rand()), *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:44s} {dt * 1e3:9.3f} ms   [compile {compile_s:.0f}s]',
          flush=True)
    return dt


def mk_idx(eps, shape, bound):
    k = jax.random.fold_in(jax.random.PRNGKey(11),
                           (eps * 1e6).astype(jnp.int32))
    return jax.random.randint(k, shape, 0, bound, jnp.int32)


# ---- A/B/C: lane gather over (R, L) table, REPS gathers back-to-back ----
def lane_gather_kernel(idx_ref, tbl_ref, out_ref, *, reps):
    acc = jnp.zeros_like(out_ref)
    tbl = tbl_ref[...]
    for r in range(reps):
        idx = (idx_ref[...] + r) % tbl.shape[1]
        acc += jnp.take_along_axis(tbl, idx, axis=1,
                                   mode='promise_in_bounds')
    out_ref[...] = acc


def bench_lane(R, L, dtype, reps=64, iters=20):
    tbl = jnp.asarray(np.random.randn(R, L), dtype)

    def run(eps, tbl):
        idx = mk_idx(eps, (R, L), L)
        return pl.pallas_call(
            functools.partial(lane_gather_kernel, reps=reps),
            out_shape=jax.ShapeDtypeStruct((R, L), dtype),
        )(idx, tbl)

    dt = timeit(f'lane  ({R:4d},{L:6d}) {dtype} x{reps}', run, tbl,
                iters=iters)
    per = dt / (reps * R * L)
    print(f'    -> {per * 1e9:8.3f} ns per gathered element '
          f'({per * L * 1e9:8.2f} ns per {L}-lane row-of-samples)')
    return per


# ---- D: sublane gather over (H, WC) table ----
def sub_gather_kernel(idx_ref, tbl_ref, out_ref, *, reps):
    acc = jnp.zeros_like(out_ref)
    tbl = tbl_ref[...]
    for r in range(reps):
        idx = (idx_ref[...] + r) % tbl.shape[0]
        acc += jnp.take_along_axis(tbl, idx, axis=0,
                                   mode='promise_in_bounds')
    out_ref[...] = acc


def bench_sub(H, WC, dtype, reps=8, iters=20):
    tbl = jnp.asarray(np.random.randn(H, WC), dtype)

    def run(eps, tbl):
        idx = mk_idx(eps, (H, WC), H)
        return pl.pallas_call(
            functools.partial(sub_gather_kernel, reps=reps),
            out_shape=jax.ShapeDtypeStruct((H, WC), dtype),
        )(idx, tbl)

    dt = timeit(f'sublane ({H:4d},{WC:6d}) {dtype} x{reps}', run, tbl,
                iters=iters)
    per_row = dt / (reps * H)  # gathered WC-wide rows
    print(f'    -> {per_row * 1e9:8.2f} ns per gathered {WC}-wide row')
    return per_row


# ---- XLA baseline: HBM row gather like the production sampler ----
def bench_xla(n_tables, rows, width, n_samples, dtype, iters=20):
    tbl = jnp.asarray(np.random.randn(n_tables, rows, width), dtype)

    def run(eps, tbl):
        idx = mk_idx(eps, (n_tables, n_samples), rows)
        return jnp.take_along_axis(tbl, idx[..., None], axis=1)

    dt = timeit(
        f'XLA rows ({n_tables}x{rows}x{width}) {dtype} S={n_samples}',
        run, tbl, iters=iters)
    per = dt / (n_tables * n_samples)
    print(f'    -> {per * 1e9:8.2f} ns per gathered {width}-wide row')
    return per


if __name__ == '__main__':
    print('devices:', jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'xla'):
        # production-like: 24 tables (B8 x 3 planes), 65536 rows, 128-wide
        # packed bf16, 196k samples each
        bench_xla(24, 65536, 128, 196608, jnp.bfloat16, iters=5)
    if which in ('all', 'a'):
        bench_lane(32, 128, jnp.float32)
        bench_lane(32, 128, jnp.bfloat16)
    if which in ('all', 'b'):
        bench_lane(32, 512, jnp.float32)
        bench_lane(32, 2048, jnp.float32)
    if which in ('all', 'c'):
        bench_lane(32, 65536, jnp.float32, reps=4, iters=5)
        bench_lane(8, 65536, jnp.float32, reps=4, iters=5)
        # production 2x2-packed layout: (4C, (H/2)*(W/2)) bf16
        bench_lane(128, 16384, jnp.bfloat16, reps=4, iters=5)
        bench_lane(8, 16384, jnp.float32, reps=8, iters=10)
    if which in ('all', 'd'):
        bench_sub(256, 8192, jnp.float32, reps=4, iters=5)
        bench_sub(256, 1024, jnp.float32, reps=8, iters=10)
