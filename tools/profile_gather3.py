"""Gather cost-model microbench: ns/row of take_along_axis vs table shape,
row width, dtype, batching, index order. Informs the round-4 attack on the
91ms/pass tri-plane gather (4.7M rows of 128ch bf16 from 65536-row tables).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

R_TAB = 65536          # 256^2 packed rows per (n, plane)
B = 24                 # n*3 planes at batch 8
M = 196608             # samples per image per pass (4096 rays x 48)


def probe(name, fn, iters=8):
    f = jax.jit(fn)
    out = f(jnp.float32(0.5))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


rng = np.random.RandomState(0)
idx_np = rng.randint(0, R_TAB, (B, M)).astype(np.int32)
# ray-coherent indices: what the front plane actually sees (slowly varying
# along each 48-sample ray)
base = rng.randint(0, R_TAB - 64, (B, M // 48, 1)).astype(np.int32)
idx_coh_np = (base + rng.randint(0, 48, (B, M // 48, 48))).reshape(B, M)
idx_sorted_np = np.sort(idx_np, axis=1)

tab32 = jax.device_put(rng.randn(B, R_TAB, 128).astype(np.float32))
tab16 = jax.device_put(tab32.astype(jnp.bfloat16))
tab16_64 = jax.device_put(np.asarray(tab16[..., :64]))
tab16_32 = jax.device_put(np.asarray(tab16[..., :32]))
tab16_256 = jax.device_put(jnp.concatenate([tab16, tab16], -1))
idx = jax.device_put(idx_np)
idx_coh = jax.device_put(idx_coh_np)
idx_sorted = jax.device_put(idx_sorted_np)
flat_tab16 = jax.device_put(np.asarray(tab16).reshape(B * R_TAB, 128))
flat_idx = jax.device_put(
    (idx_np + (np.arange(B, dtype=np.int32) * R_TAB)[:, None]).reshape(-1))

rows = B * M


def mk(eps, i):
    # derive indices on-device from the host scalar: defeats dispatch dedup
    return jnp.clip(i + (eps * 0).astype(jnp.int32), 0, None)


def t_rows(name, fn):
    dt = probe(name, fn)
    print(f"{name:46s} {dt*1000:8.2f} ms   {dt/rows*1e9:6.2f} ns/row",
          flush=True)


t_rows("bf16 128ch  (the production gather)",
       lambda e: jnp.take_along_axis(tab16, mk(e, idx)[..., None], axis=1))
t_rows("f32  128ch",
       lambda e: jnp.take_along_axis(tab32, mk(e, idx)[..., None], axis=1))
t_rows("bf16  64ch",
       lambda e: jnp.take_along_axis(tab16_64, mk(e, idx)[..., None], axis=1))
t_rows("bf16  32ch",
       lambda e: jnp.take_along_axis(tab16_32, mk(e, idx)[..., None], axis=1))
t_rows("bf16 256ch",
       lambda e: jnp.take_along_axis(tab16_256, mk(e, idx)[..., None], axis=1))
t_rows("bf16 128ch flat (one unbatched gather)",
       lambda e: flat_tab16[mk(e, flat_idx)])
t_rows("bf16 128ch ray-coherent idx",
       lambda e: jnp.take_along_axis(tab16, mk(e, idx_coh)[..., None], axis=1))
t_rows("bf16 128ch pre-sorted idx",
       lambda e: jnp.take_along_axis(tab16, mk(e, idx_sorted)[..., None],
                                     axis=1))


def sorted_flag(e):
    d = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(0,),
        start_index_map=(0,), operand_batching_dims=(),
        start_indices_batching_dims=())
    i = mk(e, idx_sorted)

    def one(tab_b, idx_b):
        return jax.lax.gather(tab_b, idx_b[:, None], d, (1, 128),
                              indices_are_sorted=True, unique_indices=False,
                              mode=jax.lax.GatherScatterMode.CLIP)
    return jax.vmap(one)(tab16, i)


t_rows("bf16 128ch sorted + indices_are_sorted", sorted_flag)

# dynamic-slice formulation: XLA sometimes picks a different path
t_rows("bf16 128ch via vmap dynamic_slice rows",
       lambda e: jax.vmap(jax.vmap(
           lambda t, i: jax.lax.dynamic_slice(t, (i, 0), (1, 128)),
           in_axes=(None, 0)))(tab16, mk(e, idx[:, :8192])))
