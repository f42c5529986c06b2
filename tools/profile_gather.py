import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

# 12 tables (N*3 planes) of (65536, 32); 786k lookups each
NT, HW, C, M = 12, 65536, 32, 786432
rng = np.random.RandomState(0)
tables = jnp.asarray(rng.randn(NT, HW, C).astype(np.float32))
idx = jnp.asarray(rng.randint(0, HW, (NT, M)).astype(np.int32))


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(args[0], args[1] + i)  # vary indices: defeat dispatch cache
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    print(f"{name:38s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms", flush=True)


bench("vmap f[ix] rows", jax.jit(
    lambda t, ix: jax.vmap(lambda f, i: f[jnp.clip(i, 0, HW-1)])(t, ix)),
    tables, idx)

bench("flat take rows", jax.jit(
    lambda t, ix: jnp.take(t.reshape(NT*HW, C),
                           (jnp.clip(ix, 0, HW-1)
                            + jnp.arange(NT)[:, None]*HW).reshape(-1),
                           axis=0)), tables, idx)

bench("take_along_axis rows", jax.jit(
    lambda t, ix: jnp.take_along_axis(
        t, jnp.clip(ix, 0, HW-1)[..., None], axis=1)), tables, idx)

bench("vmap f[ix] bf16 table", jax.jit(
    lambda t, ix: jax.vmap(lambda f, i: f[jnp.clip(i, 0, HW-1)])(
        t.astype(jnp.bfloat16), ix)), tables, idx)

# transposed layout: gather along minor axis (C, HW) -> strided
bench("per-channel gather (C,HW)", jax.jit(
    lambda t, ix: jax.vmap(lambda f, i: f[:, jnp.clip(i, 0, HW-1)])(
        t.transpose(0, 2, 1), ix)), tables, idx)

# sorted indices (coherence)
idx_sorted = jnp.sort(idx, axis=1)
bench("vmap f[ix] SORTED rows", jax.jit(
    lambda t, ix: jax.vmap(lambda f, i: f[jnp.clip(i, 0, HW-1)])(t, ix)),
    tables, idx_sorted)

# fewer, wider rows: pack 2x2 patches -> (HW, 128) table, single gather
tables128 = jnp.asarray(rng.randn(NT, HW, 128).astype(np.float32))
idx4 = idx[:, :M // 4]
bench("packed 4xC rows (M/4 gathers)", jax.jit(
    lambda t, ix: jax.vmap(lambda f, i: f[jnp.clip(i, 0, HW-1)])(t, ix)),
    tables128, idx4)
