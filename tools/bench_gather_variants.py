"""Microbench: XLA TPU gather formulations for the tri-plane sampling hot op.

Question set (round 4 perf work):
  1. Does index LOCALITY change gather speed? (random vs sorted vs clustered)
  2. Batched (N, HW, C) take_along_axis vs one flat global-offset gather.
  3. Row width scaling (32/64/128/256 ch) and dtype (bf16 vs f32).
  4. Cost of a full sort + gather + unsort round trip vs the raw gather.

Trusted protocol: every timed fn is one jit whose indices derive from a
fresh host scalar so nothing can be cached/deduped.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 24            # batch*planes in the real op
HW = 65536        # 256^2 table rows
M = 196608        # samples per batch entry (64^2 rays x 48 depths)
ITERS = 10


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args, jnp.float32(0.5))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = f(*args, jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    rows = N * M
    print(f"{name:54s} {dt * 1000:8.2f} ms  {dt / rows * 1e9:6.2f} ns/row",
          flush=True)
    return dt


def mk_idx(eps, kind, m=M):
    k = jax.random.fold_in(jax.random.PRNGKey(11),
                           (eps * 1e6).astype(jnp.int32))
    idx = jax.random.randint(k, (N, m), 0, HW, jnp.int32)
    if kind == 'sorted':
        idx = jnp.sort(idx, axis=-1)
    elif kind == 'cluster':
        # ray-coherent-ish: small jitter around a smooth base
        base = jnp.linspace(0, HW - 256, m, dtype=jnp.float32)
        idx = (base[None] + jax.random.randint(k, (N, m), 0, 256,
                                               jnp.int32)).astype(jnp.int32)
    return idx


def main():
    print(f"device={jax.devices()[0]} N={N} HW={HW} M={M}")
    for dtype, tag in ((jnp.bfloat16, 'bf16'), (jnp.float32, 'f32')):
        for C in (32, 128):
            table = jax.random.normal(jax.random.PRNGKey(0), (N, HW, C),
                                      jnp.float32).astype(dtype)
            flat = table.reshape(N * HW, C)

            def batched(t, eps, kind='random'):
                idx = mk_idx(eps, kind)
                return jnp.take_along_axis(t, idx[..., None], axis=1)

            def flatg(t, eps, kind='random'):
                idx = mk_idx(eps, kind) + \
                    (jnp.arange(N, dtype=jnp.int32) * HW)[:, None]
                return jnp.take(t, idx.reshape(-1), axis=0)

            timeit(f"[{tag} C={C}] batched take_along_axis random",
                   batched, table)
            timeit(f"[{tag} C={C}] batched take_along_axis SORTED",
                   lambda t, e: batched(t, e, 'sorted'), table)
            timeit(f"[{tag} C={C}] batched take_along_axis CLUSTER",
                   lambda t, e: batched(t, e, 'cluster'), table)
            timeit(f"[{tag} C={C}] flat global jnp.take random",
                   flatg, flat)
            timeit(f"[{tag} C={C}] flat global jnp.take SORTED",
                   lambda t, e: flatg(t, e, 'sorted'), flat)

    # sort + gather + unsort round trip at the production width
    table = jax.random.normal(jax.random.PRNGKey(0), (N, HW, 128),
                              jnp.float32).astype(jnp.bfloat16)

    def sort_gather_unsort(t, eps):
        idx = mk_idx(eps, 'random')
        order = jnp.argsort(idx, axis=-1)
        sidx = jnp.take_along_axis(idx, order, axis=-1)
        g = jnp.take_along_axis(t, sidx[..., None], axis=1)
        inv = jnp.argsort(order, axis=-1)
        return jnp.take_along_axis(g, inv[..., None], axis=1)
    timeit("[bf16 C=128] argsort+gather+unsort round trip",
           sort_gather_unsort, table)

    def sort_only(t, eps):
        idx = mk_idx(eps, 'random')
        return jnp.sort(idx, axis=-1)
    timeit("[i32] sort 196k idx per row alone", sort_only, table)


if __name__ == '__main__':
    main()
