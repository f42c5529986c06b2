"""Break down the 1181ms volume render (batch 4, 64^2 rays, 48+48)."""
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

B = int(os.environ.get('PV_BATCH', '4'))
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
dec_params = params['decoder']


def bench(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:9.1f} ms")
    return out

S = 48
R = 64 * 64
depths = bench("sample_stratified 48", jax.jit(
    lambda ro: RD.sample_stratified(None, ro, 2.25, 3.3, S)), ro)
coords = (ro[:, :, None] + depths * rd[:, :, None]).reshape(B, -1, 3)
coords = jax.block_until_ready(coords)
dirs = jnp.broadcast_to(rd[:, :, None], (B, R, S, 3)).reshape(B, -1, 3)

feats = bench("sample_from_planes 786k pts", jax.jit(
    lambda p, co: RD.sample_from_planes(p, co, 1.0)), planes, coords)

dec = bench("decoder MLP 786k pts", jax.jit(
    lambda dp, f: G.decoder(dp, f, None)), dec_params, feats)

out = bench("run_model (sample+decode)", jax.jit(
    lambda p, co, d: RD.ImportanceRenderer.run_model(
        None, p, (dec_params, G.decoder), co, d, opts)), planes, coords, dirs)

colors = out['rgb'].reshape(B, R, S, -1)
dens = out['sigma'].reshape(B, R, S, 1)
colors = jax.block_until_ready(colors)

w = bench("mip_ray_marcher2 (48)", jax.jit(
    lambda c_, d_, z: mip_ray_marcher2(c_, d_, z, opts)[2]),
    colors, dens, depths)

dfine = bench("sample_importance (pdf 48->48)", jax.jit(
    lambda z, w_: RD.sample_importance(None, z, w_, 48)), depths, w)

bench("unify_samples (sort-merge 96)", jax.jit(
    lambda d1, c1, s1, d2: RD.unify_samples(d1, c1, s1, d2, c1, s1)[0]),
    depths, colors, dens, dfine)

rend = RD.ImportanceRenderer()
bench("FULL renderer (2 pass)", jax.jit(
    lambda p, ro, rd_: rend(None, p, (dec_params, G.decoder), ro, rd_,
                            opts)[0]), planes, ro, rd, iters=3)

# bf16 planes variant of sampling
planes16 = planes.astype(jnp.bfloat16)
bench("sample_from_planes bf16 planes", jax.jit(
    lambda p, co: RD.sample_from_planes(p, co, 1.0)), planes16, coords)
