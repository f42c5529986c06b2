"""Prototype: can an in-kernel (VMEM-resident table) gather beat XLA's
take_along_axis for tri-plane sampling rows?

Timing protocol: per-call FETCH of a tiny output slice forces real
execution (the axon runtime can serve repeat dispatches lazily; a fetch is
the only sync that provably waits). Calibrate overhead with the null fn.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW = 256 * 256
C = 32
NB = 24       # batch*planes
MP = 1 << 14  # rows per batch entry (16384)
M = NB * MP

rs = np.random.RandomState(0)
table_cf = jax.device_put(jnp.asarray(
    rs.randn(NB, C, HW) * 0.1, jnp.bfloat16))          # channel-major
table_rc = jax.device_put(jnp.transpose(table_cf, (0, 2, 1)))  # (NB, HW, C)
idx3 = jax.device_put(jnp.asarray(
    rs.randint(0, HW, (NB, 1, MP)), jnp.int32))
idx2 = idx3[:, 0]


def bench(name, fn, *args, iters=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out.reshape(-1)[:8])
    csec = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(iters):
        out = f(*args)
        _ = np.asarray(out.reshape(-1)[:8])   # fetch => forced execution
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:9.2f} ms  {dt/M*1e9:5.1f} ns/row  [c {csec:.0f}s]",
          flush=True)
    return dt


bench("null (fetch overhead)", lambda t: t[:1, :1, :128] * 2.0, table_cf)

# A. XLA baseline (the current production pattern)
bench("XLA take_along_axis (NB,HW)xC bf16",
      lambda t, i: jnp.take_along_axis(t, i[..., None], axis=1),
      table_rc, idx2)


# B. Pallas: table (C, HW) resident in VMEM; lane-axis take_along_axis
def _k_lane(idx_ref, tab_ref, out_ref):
    ii = jnp.broadcast_to(idx_ref[0], (C,) + idx_ref.shape[2:])
    out_ref[0] = jnp.take_along_axis(tab_ref[0], ii, axis=1)


def pallas_lane(tab_cf, ind, tile=4096):
    T = MP // tile
    return pl.pallas_call(
        _k_lane,
        grid=(NB, T),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, HW), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, C, MP), jnp.bfloat16),
    )(ind, tab_cf)

try:
    bench("pallas lane-gather (C,HW) VMEM", pallas_lane, table_cf, idx3)
except Exception as e:
    print(f"pallas lane-gather FAILED: {type(e).__name__}: {str(e)[:300]}")


# C. Pallas: table (HW, C) resident; row (sublane-axis) gather
def _k_row(idx_ref, tab_ref, out_ref):
    tile = idx_ref.shape[2]
    ii = jnp.broadcast_to(idx_ref[0, 0][:, None], (tile, C))
    out_ref[0] = jnp.take_along_axis(tab_ref[0], ii, axis=0)


def pallas_row(tab, ind, tile=2048):
    T = MP // tile
    return pl.pallas_call(
        _k_row,
        grid=(NB, T),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, MP, C), jnp.bfloat16),
    )(ind, tab)

try:
    bench("pallas row-gather (HW,C) VMEM", pallas_row, table_rc, idx3)
except Exception as e:
    print(f"pallas row-gather FAILED: {type(e).__name__}: {str(e)[:300]}")
