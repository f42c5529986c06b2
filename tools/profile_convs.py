"""Where do the conv stacks lose MFU? Chained-iteration timing (defeats
remote dispatch caching: one dispatch runs `REPS` data-dependent
iterations inside fori_loop), bf16 at backbone/SR shapes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from next3d_tpu.ops import conv2d_resample, setup_filter
from next3d_tpu.ops.upfirdn2d import upfirdn2d

f = setup_filter([1, 3, 3, 1])
rng = np.random.RandomState(0)
REPS = 20


def bench(name, step, x, flops_per_rep=None, iters=3):
    @jax.jit
    def chained(x):
        return jax.lax.fori_loop(
            0, REPS, lambda i, v: step(v) * 0.999, x)

    out = jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    for k in range(iters):
        out = chained(x + jnp.asarray(k, x.dtype) * 1e-3)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / REPS
    extra = ''
    if flops_per_rep:
        extra = f'  ({flops_per_rep / dt / 1e12:6.1f} TFLOP/s)'
    print(f'{name:44s} {dt * 1000:8.3f} ms/rep{extra}', flush=True)


cases = [
    ('128ch@256^2', (4, 128, 256, 256)),
    ('256ch@128^2', (4, 256, 128, 128)),
    ('512ch@64^2', (4, 512, 64, 64)),
    ('128ch@512^2 (SR)', (4, 128, 512, 512)),
]
for name, (N, C, H, W) in cases:
    x = jnp.asarray(rng.randn(N, C, H, W).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(C, C, 3, 3).astype(np.float32)).astype(
        jnp.bfloat16)
    fl = 2 * N * H * W * C * C * 9

    bench(f'{name} plain 3x3 conv', lambda v: jax.lax.conv_general_dilated(
        v, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW')), x, fl)
    bench(f'{name} conv2d_resample(up=1)', lambda v: conv2d_resample(
        v, w, f=f, up=1, padding=1, flip_weight=True), x, fl)
    bench(f'{name} blur upfirdn', lambda v: upfirdn2d(
        v, f, padding=[1, 1, 1, 1]), x)
    bench(f'{name} up2+down2 round trip', lambda v: upfirdn2d(
        upfirdn2d(v, f, up=2, padding=[2, 1, 2, 1], gain=4), f, down=2,
        padding=[1, 1, 1, 1]), x)
