"""Bisect the full-renderer composition slowdown (pieces sum to ~320ms,
jitted 2-pass composition 1139ms). Tests optimization_barrier placements."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.render import renderer as RD
from next3d_tpu.render.ray_sampler import sample_rays

B = 4
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4)
params = G.init(jax.random.PRNGKey(0))
c = ge._camera_batch(B)
ro, rd = sample_rays(jnp.asarray(c[:, :16].reshape(-1, 4, 4)),
                     jnp.asarray(c[:, 16:25].reshape(-1, 3, 3)), 64)
planes = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(1), (B, 3, 32, 256, 256)))
opts = dict(ge.RENDER_KW_FFHQ)
dec = (params['decoder'], G.decoder)
rend = RD.ImportanceRenderer()


def bench(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms",
          flush=True)


bench("FULL baseline", jax.jit(
    lambda p, ro, rd_: rend(None, p, dec, ro, rd_, opts)[0]),
    planes, ro, rd, iters=3)

# variant 1: barrier on the transposed feat inside sample_from_planes
orig_sample = RD.sample_from_planes


def sample_barrier_feat(plane_features, coordinates, box_warp):
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    feats = plane_features.reshape(N * n_planes, C, H, W)
    coords = (2 / box_warp) * coordinates
    proj = RD.project_onto_planes(coords)
    from next3d_tpu.ops import grid_sample_2d
    feats, proj = jax.lax.optimization_barrier((feats, proj))
    out = grid_sample_2d(feats, proj[:, None])
    return out[:, :, 0].transpose(0, 2, 1).reshape(N, n_planes, M, C)


RD.sample_from_planes = sample_barrier_feat
bench("barrier(feats+proj) in sample", jax.jit(
    lambda p, ro, rd_: rend(None, p, dec, ro, rd_, opts)[0]),
    planes, ro, rd, iters=3)
RD.sample_from_planes = orig_sample

# variant 2: barrier on coords only
def sample_barrier_coords(plane_features, coordinates, box_warp):
    coordinates = jax.lax.optimization_barrier(coordinates)
    return orig_sample(plane_features, coordinates, box_warp)


RD.sample_from_planes = sample_barrier_coords
bench("barrier(coords) in sample", jax.jit(
    lambda p, ro, rd_: rend(None, p, dec, ro, rd_, opts)[0]),
    planes, ro, rd, iters=3)
RD.sample_from_planes = orig_sample

# variant 3: barrier on the pre-transposed feat (hoist transpose out)
def sample_barrier_pretransposed(plane_features, coordinates, box_warp):
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    coords = (2 / box_warp) * coordinates
    proj = RD.project_onto_planes(coords)  # (N*3, M, 2)
    feat = plane_features.reshape(N * n_planes, C, H, W)
    feat = feat.transpose(0, 2, 3, 1).reshape(N * n_planes, H * W, C)
    feat = jax.lax.optimization_barrier(feat)
    x = (proj[..., 0] + 1) * (W / 2) - 0.5
    y = (proj[..., 1] + 1) * (H / 2) - 0.5
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    wx1 = x - x0; wy1 = y - y0
    x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        g = jnp.take_along_axis(feat, idx[..., None], axis=1)
        return g * (w * valid.astype(feat.dtype))[..., None]

    out = (corner(x0, y0, (1 - wx1) * (1 - wy1))
           + corner(x0 + 1, y0, wx1 * (1 - wy1))
           + corner(x0, y0 + 1, (1 - wx1) * wy1)
           + corner(x0 + 1, y0 + 1, wx1 * wy1))
    return out.reshape(N, n_planes, M, C)


RD.sample_from_planes = sample_barrier_pretransposed
bench("barrier(feat) pre-transposed", jax.jit(
    lambda p, ro, rd_: rend(None, p, dec, ro, rd_, opts)[0]),
    planes, ro, rd, iters=3)
RD.sample_from_planes = orig_sample

# variant 4: coarse-only (importance=0) cost
opts0 = dict(opts); opts0['depth_resolution_importance'] = 0
bench("coarse-only (48, no fine pass)", jax.jit(
    lambda p, ro, rd_: rend(None, p, dec, ro, rd_, opts0)[0]),
    planes, ro, rd, iters=3)
