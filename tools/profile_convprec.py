"""Microbench: conv precision/layout variants on the hot SR/UNet shapes.

Relative comparisons only (axon microbenches are noisy); acceptance of any
change is via end-to-end bench.py A/B per the repo discipline.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp


def timeit(name, fn, *args, iters=10):
    # put everything on device ONCE; vary the input with an on-device add
    # (the axon tunnel makes host->device transfer look like compute time)
    args = [jax.device_put(jnp.asarray(a)) for a in args]
    perturb = jax.jit(lambda a, e: a + e.astype(a.dtype))
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(perturb(args[0], jnp.float32(i * 1e-6)), *args[1:])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:8.2f} ms")
    return dt


def conv(x, w, prec, dn=("NCHW", "OIHW", "NCHW"), dil=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=dil, dimension_numbers=dn, precision=prec)


B = 8
for (Cin, Cout, H) in [(256, 256, 256), (128, 128, 512)]:
    x32 = np.random.randn(B, Cin, H, H).astype(np.float32)
    w32 = np.random.randn(Cout, Cin, 3, 3).astype(np.float32) * 0.05
    x16 = x32.astype(jnp.bfloat16)
    w16 = w32.astype(jnp.bfloat16)
    gflop = 2 * 9 * Cin * Cout * H * H * B / 1e9
    print(f"--- {Cin}->{Cout} @ {H}^2  ({gflop:.0f} GFLOP)")
    f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.HIGHEST))
    dt = timeit("bf16 HIGHEST NCHW", f, x16, w16)
    print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")
    f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.DEFAULT))
    dt = timeit("bf16 DEFAULT NCHW", f, x16, w16)
    print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")
    f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.HIGHEST))
    dt = timeit("f32 HIGHEST NCHW", f, x32, w32)
    print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")
    f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.DEFAULT))
    dt = timeit("f32 DEFAULT NCHW", f, x32, w32)
    print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")
    # NHWC layout
    xh = np.ascontiguousarray(x16.transpose(0, 2, 3, 1))
    wh = np.ascontiguousarray(np.asarray(w16).transpose(2, 3, 1, 0))
    f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.DEFAULT,
                                  dn=("NHWC", "HWIO", "NHWC")))
    dt = timeit("bf16 DEFAULT NHWC", f, xh, wh)
    print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")

# lhs-dilated upsampling conv (SR block up path): 256->128 @ 256 -> 512
x16 = np.random.randn(B, 256, 256, 256).astype(jnp.bfloat16)
w16 = np.random.randn(128, 256, 3, 3).astype(jnp.bfloat16) * 0.05
gflop = 2 * 9 * 256 * 128 * 512 * 512 * B / 1e9
print(f"--- dilated up2 256->128 @512^2 ({gflop:.0f} GFLOP)")
f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.HIGHEST, dil=(2, 2)))
dt = timeit("bf16 HIGHEST NCHW lhs_dil=2", f, x16, w16)
print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")
f = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.DEFAULT, dil=(2, 2)))
dt = timeit("bf16 DEFAULT NCHW lhs_dil=2", f, x16, w16)
print(f"    -> {gflop/dt/1000:.1f} TFLOP/s")
