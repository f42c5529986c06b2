"""Bisect round 2: is the pathology the coarse->fine junction, and which
barrier placement fixes it?"""
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
from next3d_tpu.render.ray_marcher import mip_ray_marcher2
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
S = 48
R = 64 * 64


def bench(name, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms",
          flush=True)
    return out


def coarse_half(p, ro_, rd_):
    depths = RD.sample_stratified(None, ro_, 2.25, 3.3, S)
    coords = (ro_[:, :, None] + depths * rd_[:, :, None]).reshape(B, -1, 3)
    dirs = jnp.broadcast_to(rd_[:, :, None], (B, R, S, 3)).reshape(B, -1, 3)
    out = rend.run_model(p, dec, coords, dirs, opts)
    colors = out['rgb'].reshape(B, R, S, -1)
    dens = out['sigma'].reshape(B, R, S, 1)
    _, _, w = mip_ray_marcher2(colors, dens, depths, opts)
    dfine = RD.sample_importance(None, depths, w, S)
    return depths, colors, dens, dfine


def fine_half(p, ro_, rd_, depths, colors, dens, dfine):
    coords = (ro_[:, :, None] + dfine * rd_[:, :, None]).reshape(B, -1, 3)
    dirs = jnp.broadcast_to(rd_[:, :, None], (B, R, S, 3)).reshape(B, -1, 3)
    out = rend.run_model(p, dec, coords, dirs, opts)
    cf = out['rgb'].reshape(B, R, S, -1)
    df = out['sigma'].reshape(B, R, S, 1)
    ad, ac, asg = RD.unify_samples(depths, colors, dens, dfine, cf, df)
    rgb, dep, w = mip_ray_marcher2(ac, asg, ad, opts)
    return rgb


halves = bench("coarse half (-> depths_fine)", jax.jit(coarse_half),
               planes, ro, rd)
bench("fine half (materialized inputs)", jax.jit(fine_half),
      planes, ro, rd, *halves)


def fused_barrier(p, ro_, rd_):
    h = coarse_half(p, ro_, rd_)
    h = jax.lax.optimization_barrier(h)
    return fine_half(p, ro_, rd_, *h)


bench("fused with barrier(depths_fine)", jax.jit(fused_barrier),
      planes, ro, rd)


def fused_nobarrier(p, ro_, rd_):
    h = coarse_half(p, ro_, rd_)
    return fine_half(p, ro_, rd_, *h)


bench("fused no barrier", jax.jit(fused_nobarrier), planes, ro, rd)
