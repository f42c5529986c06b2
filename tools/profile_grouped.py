"""Grouped-patch tri-plane sampler: footprint diagnostic + exactness +
timing vs the XLA gather path, on render-pass-shaped workloads at several
camera poses. Run on TPU (JAX_PLATFORMS=axon) or CPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from next3d_tpu.render.ray_sampler import sample_rays
from next3d_tpu.render.renderer import sample_from_planes
from next3d_tpu.ops.pallas_triplane import (group_footprint,
                                            sample_from_planes_grouped)

B = int(os.environ.get('PG_B', '4'))
IMG = int(os.environ.get('PG_IMG', '64'))
S = int(os.environ.get('PG_S', '48'))
TH = int(os.environ.get('PG_TH', '8'))
DC = int(os.environ.get('PG_DC', '8'))
PR = int(os.environ.get('PG_PR', '48'))
PC = int(os.environ.get('PG_PC', '96'))
POSES = [(0.0, 0.0), (0.4, 0.0), (-0.4, 0.0), (0.78, 0.0), (0.0, 0.4),
         (0.35, -0.3)]

rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 32, 256, 256).astype(np.float32))


def coords_for(yaw, pitch, fine_like=False):
    import math
    from next3d_tpu.render import camera_utils
    cam = camera_utils.lookat_pose(math.pi / 2 + yaw, math.pi / 2 + pitch,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7,
                                   batch_size=B)
    K = np.broadcast_to(camera_utils.fov_to_intrinsics(18.837)[None],
                        (B, 3, 3))
    ro, rd = sample_rays(jnp.asarray(cam).reshape(-1, 4, 4),
                         jnp.asarray(K), IMG)
    t = np.linspace(2.25, 3.3, S, dtype=np.float32)
    t = t[None, None, :, None] + rng.rand(B, IMG * IMG, S, 1).astype(
        np.float32) * (1.05 / (S - 1))
    if fine_like:
        # importance-like: depths cluster around a surface at ~2.7 with
        # per-ray spread, still sorted per ray
        center = 2.7 + 0.1 * rng.randn(B, IMG * IMG, 1, 1).astype(np.float32)
        t = np.sort(center + 0.18 * (rng.rand(B, IMG * IMG, S, 1)
                                     .astype(np.float32) - 0.5), axis=2)
    coords = ro[:, :, None] + jnp.asarray(t) * rd[:, :, None]
    return coords.reshape(B, -1, 3)


def main():
    print(f'tile {TH}x{TH} x dc {DC}  patch ({PR},{PC})', flush=True)
    worst = np.zeros((3, 2))
    for yaw, pitch in POSES:
        for fine in (False, True):
            co = coords_for(yaw, pitch, fine)
            fp = group_footprint(co, 1.0, 256, 256, IMG, IMG, S,
                                 (TH, TH), DC)
            worst = np.maximum(worst, fp)
    print('worst per-plane (row_span, col_span):\n', worst.round(1),
          flush=True)

    co = coords_for(0.35, -0.3, False)
    ref = sample_from_planes(planes, co, 1.0)
    got = sample_from_planes_grouped(planes, co, 1.0, (IMG, IMG), S,
                                     (TH, TH), DC, patch_r=PR, patch_c=PC)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f'max abs err vs XLA (coarse, yaw .35): {err:.2e}', flush=True)
    co2 = coords_for(0.78, 0.0, True)
    ref2 = sample_from_planes(planes, co2, 1.0)
    got2 = sample_from_planes_grouped(planes, co2, 1.0, (IMG, IMG), S,
                                      (TH, TH), DC, patch_r=PR, patch_c=PC)
    err2 = float(jnp.max(jnp.abs(ref2 - got2)))
    print(f'max abs err vs XLA (fine-like, yaw .78): {err2:.2e}', flush=True)

    xla = jax.jit(lambda p, c: sample_from_planes(p, c, 1.0))
    grp = jax.jit(lambda p, c: sample_from_planes_grouped(
        p, c, 1.0, (IMG, IMG), S, (TH, TH), DC, patch_r=PR, patch_c=PC))

    def bench(name, fn):
        out = fn(planes, co)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            out = fn(planes + np.float32(i) * 1e-7, co)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f'{name:24s} {dt * 1000:8.2f} ms '
              f'({B * IMG * IMG * S / dt / 1e6:.1f} Msamples/s)', flush=True)

    bench('xla gather', xla)
    bench('grouped pallas', grp)


if __name__ == '__main__':
    main()
