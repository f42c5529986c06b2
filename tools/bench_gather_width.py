"""Gather ns/row vs ROW WIDTH — is the 11.5 ns/row issue floor width-
independent beyond the 256 B the round-4 microbenches tested?

The texture gather's packed rows are 4x132 ch bf16 = 1056 B (vs 256 B for
the tri-plane tables). docs/STAGE_PROFILE.md claims width independence for
64..256 B; the texture stage sits at ~2x its row-count floor, and a width
cliff between 256 B and 1056 B would fully explain that without any fixable
overhead. Value-fetched timing per iteration (block_until_ready is not a
reliable sync on this client — see STAGE_PROFILE "measurement discipline").

Run on the chip:  python tools/bench_gather_width.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 8
HW = 256 * 256
M = 262144            # rows gathered per image (texture stage shape)
ITERS = int(os.environ.get('ITERS', '8'))


def run(C):
    @jax.jit
    def f(table, idx):
        out = jnp.take_along_axis(table, idx[..., None], axis=1)
        return jnp.sum(out.astype(jnp.float32))

    k1, k2 = jax.random.split(jax.random.PRNGKey(C))
    ts = []
    for i in range(ITERS + 2):
        table = jax.random.normal(
            jax.random.fold_in(k1, i), (N, HW, C), jnp.float32
        ).astype(jnp.bfloat16)
        idx = jax.random.randint(jax.random.fold_in(k2, i), (N, M), 0, HW,
                                 jnp.int32)
        float(jnp.sum(table[:, 0, :].astype(jnp.float32)))  # stage inputs
        t0 = time.perf_counter()
        v = float(f(table, idx))  # value fetch == guaranteed drain
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts[2:])  # drop the 2 warm-ups (compile + autotune)
    med = ts[len(ts) // 2]
    rows = N * M
    print(f'C={C:4d} ({C*2:5d} B/row): {med*1e3:8.2f} ms '
          f'= {med/rows*1e9:6.2f} ns/row  '
          f'({rows*C*2/med/1e9:6.1f} GB/s)', flush=True)


if __name__ == '__main__':
    print(f'device={jax.devices()[0]} rows/iter={N*M}', flush=True)
    # 128 ch = 256 B is the production tri-plane row; 132 ch = 264 B was the
    # round-4 fused texture row (boundary-crossing suspect); 256/512 ch
    # probe whether multi-sample row packing (2 samples per 4x4 window)
    # could amortize the per-row floor.
    for C in (32, 64, 128, 132, 256, 264, 512, 528):
        run(C)
