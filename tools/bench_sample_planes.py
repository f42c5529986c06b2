"""Isolate the real sample_from_planes cost and test producer-fusion effects.

Hypothesis: XLA fuses the 2x2-packed table construction (pad+concat+
transpose) into the gather, degrading row fetches to strided NCHW element
reads. An optimization_barrier on the table should force materialization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from next3d_tpu.render import renderer as R  # noqa: E402

B, C, H = 8, 32, 256
M = 196608
ITERS = 10


def timeit(name, fn):
    f = jax.jit(fn)
    out = f(jnp.float32(0.5))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:56s} {dt * 1000:8.2f} ms", flush=True)
    return dt


def mk(eps):
    k = jax.random.fold_in(jax.random.PRNGKey(3), (eps * 1e6).astype(jnp.int32))
    planes = jax.random.normal(k, (B, 3, C, H, H), jnp.float32)
    coords = jax.random.uniform(jax.random.fold_in(k, 1), (B, M, 3),
                                jnp.float32, -0.5, 0.5)
    return planes, coords


def main():
    print(f"device={jax.devices()[0]}")
    timeit("inputs only", lambda e: mk(e)[1])

    def current(eps):
        planes, coords = mk(eps)
        return R.sample_from_planes(planes, coords, box_warp=1.0,
                                    gather_bf16=True)
    timeit("sample_from_planes (current, bf16)", current)

    # variant: barrier the packed table before the gather
    from next3d_tpu.ops import grid_sample as GS

    def packed_barrier(input, x0, y0, wx1, wy1, Ho, Wo):
        N, C_, H_, W_ = input.shape
        dtype = input.dtype
        fpad = jnp.pad(input, ((0, 0), (0, 0), (0, 1), (0, 1)))
        packed = jnp.concatenate(
            [fpad[:, :, :H_, :W_], fpad[:, :, :H_, 1:W_ + 1],
             fpad[:, :, 1:H_ + 1, :W_], fpad[:, :, 1:H_ + 1, 1:W_ + 1]],
            axis=1)
        table = packed.transpose(0, 2, 3, 1).reshape(N, H_ * W_, 4 * C_)
        table = jax.lax.optimization_barrier(table)
        bx = jnp.clip(x0, 0, W_ - 2)
        by = jnp.clip(y0, 0, H_ - 2)
        idx = (by * W_ + bx).reshape(N, Ho * Wo)
        idx = jax.lax.optimization_barrier(idx)
        g = jnp.take_along_axis(table, idx[..., None], axis=1)
        wx0 = 1 - wx1
        wy0 = 1 - wy1

        def axis_w(b, t0, w0, w1, d):
            return w0 * (b + d == t0) + w1 * (b + d == t0 + 1)
        out = 0
        for slot, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            w = (axis_w(by, y0, wy0, wy1, dy)
                 * axis_w(bx, x0, wx0, wx1, dx)).astype(dtype).reshape(
                     N, Ho * Wo, 1)
            out = out + g[..., slot * C_:(slot + 1) * C_] * w
        return out.reshape(N, Ho, Wo, C_).transpose(0, 3, 1, 2)

    def with_barrier(eps):
        planes, coords = mk(eps)
        N, n_planes, C_, H_, W_ = planes.shape
        feats = planes.reshape(N * n_planes, C_, H_, W_).astype(jnp.bfloat16)
        proj = R.project_onto_planes(2.0 * coords)
        grid = proj[:, None]
        x = (grid[..., 0].astype(jnp.float32) + 1) * (W_ / 2) - 0.5
        y = (grid[..., 1].astype(jnp.float32) + 1) * (H_ / 2) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        out = packed_barrier(feats, x0.astype(jnp.int32), y0.astype(jnp.int32),
                             wx1, wy1, 1, grid.shape[2])
        out = out.astype(jnp.float32)
        return out[:, :, 0].transpose(0, 2, 1).reshape(N, n_planes, -1, C_)
    timeit("sample_from_planes (packed table BARRIERED)", with_barrier)

    # variant: per-corner small path (4 gathers, no packed table)
    def small(eps):
        planes, coords = mk(eps)
        N, n_planes, C_, H_, W_ = planes.shape
        feats = planes.reshape(N * n_planes, C_, H_, W_).astype(jnp.bfloat16)
        proj = R.project_onto_planes(2.0 * coords)
        out = GS._grid_sample_small(feats, proj[:, None])
        return out.astype(jnp.float32)
    timeit("per-corner 4-gather path (bf16)", small)

    # variant: barrier only the indices (keep table fused)
    def small_barrier_feats(eps):
        planes, coords = mk(eps)
        N, n_planes, C_, H_, W_ = planes.shape
        feats = planes.reshape(N * n_planes, C_, H_, W_).astype(jnp.bfloat16)
        feats = jax.lax.optimization_barrier(
            feats.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        proj = R.project_onto_planes(2.0 * coords)
        out = GS._grid_sample_small(feats, proj[:, None])
        return out.astype(jnp.float32)
    timeit("per-corner 4-gather, NHWC-barriered feats", small_barrier_feats)


if __name__ == '__main__':
    main()
