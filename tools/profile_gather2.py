"""Probe gather formulations on TPU: batched take_along_axis vs flat
jnp.take vs Pallas tpu.dynamic_gather, at the texture-sampling workload
(16 images x 65536 samples x 32ch, 4 bilinear corners)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

B, HW, C = 16, 65536, 32
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(B, HW, C).astype(np.float32))
idx = jnp.asarray(rng.randint(0, HW, size=(B, HW)).astype(np.int32))


def bench(name, fn, *args, iters=10):
    # vary the first arg per iteration: the remote-TPU client
    # short-circuits identical repeated dispatches (see bench.py)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for k in range(iters):
        a0 = args[0] + (args[0].dtype.type(k % 3) if args[0].dtype != jnp.int32
                        else jnp.int32(0))
        out = fn(a0, *args[1:])
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms",
          flush=True)
    return out


feat_flat = feat.reshape(B * HW, C)
off = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None]
# measured: take_along_axis (B,HW,C) 46ms; flat take (B*HW,C) 88ms --
# the batched formulation is the faster one; skip re-measuring
idx4 = jnp.stack([idx, (idx + 1) % HW, (idx + 7) % HW, (idx + 9) % HW], 1)
bench("4 corners, ONE batched take_along", jax.jit(
    lambda f, i: jnp.take_along_axis(
        f, i.reshape(B, 4 * HW)[..., None], axis=1)), feat, idx4)

# wider rows: pack 2x2 corners -> 128ch rows, one take
feat_wide = jnp.concatenate([feat_flat, feat_flat, feat_flat, feat_flat], -1)
bench("1 take of 128ch rows (paired corners)", jax.jit(
    lambda f, i: jnp.take(f, (i + off).reshape(-1), axis=0,
                          mode='clip')), feat_wide, idx)

# int8/bf16 table
bench("flat take bf16 table", jax.jit(
    lambda f, i: jnp.take(f, (i + off).reshape(-1), axis=0,
                          mode='clip')),
    feat_flat.astype(jnp.bfloat16), idx)

# Pallas dynamic_gather probe: x (A, 128) f32, idx (A, 128) -> axis 0
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dg_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:][..., None],
                                   axis=0)[..., 0]


for A in (512, 4096):
    x = jnp.asarray(rng.randn(A, 128).astype(np.float32))
    ii = jnp.asarray(rng.randint(0, A, size=(A, 128)).astype(np.int32))
    try:
        f = jax.jit(lambda x, i: pl.pallas_call(
            dg_kernel,
            out_shape=jax.ShapeDtypeStruct((A, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, i))
        got = np.asarray(f(x, ii))
        want = np.asarray(x)[np.asarray(ii),
                             np.arange(128)[None, :].repeat(A, 0)]
        np.testing.assert_allclose(got, want)
        bench(f"pallas dynamic_gather ({A},128) axis0", f, x, ii, iters=50)
    except Exception as e:
        print(f"dynamic_gather A={A}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
