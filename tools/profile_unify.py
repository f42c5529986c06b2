"""Pin the fine-half cost: run_model on fine coords vs unify (full outputs)
vs a multi-operand lax.sort reformulation of the sort-merge."""
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

B, R, S = 4, 64 * 64, 48
rng = np.random.RandomState(0)
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4)
params = G.init(jax.random.PRNGKey(0))
dec = (params['decoder'], G.decoder)
rend = RD.ImportanceRenderer()
opts = dict(ge.RENDER_KW_FFHQ)

d1 = jnp.asarray(np.sort(rng.rand(B, R, S, 1), 2).astype(np.float32) + 2.25)
c1 = jnp.asarray(rng.rand(B, R, S, 32).astype(np.float32))
s1 = jnp.asarray(rng.randn(B, R, S, 1).astype(np.float32))
d2 = jnp.asarray(np.sort(rng.rand(B, R, S, 1), 2).astype(np.float32) + 2.25)
c2 = jnp.asarray(rng.rand(B, R, S, 32).astype(np.float32))
s2 = jnp.asarray(rng.randn(B, R, S, 1).astype(np.float32))
dfine = jnp.asarray(np.sort(rng.rand(B, R, S, 1), 2).astype(np.float32) + 2.25)
ro = jnp.asarray(rng.randn(B, R, 3).astype(np.float32) * 0.1)
rd_ = jnp.asarray(rng.randn(B, R, 3).astype(np.float32))


def bench(name, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms",
          flush=True)
    return out


planes = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(1), (B, 3, 32, 256, 256)))


def fine_model(p, dfine_):
    coords = (ro[:, :, None] + dfine_ * rd_[:, :, None]).reshape(B, -1, 3)
    dirs = jnp.broadcast_to(rd_[:, :, None], (B, R, S, 3)).reshape(B, -1, 3)
    out = rend.run_model(p, dec, coords, dirs, opts)
    return out['rgb'].reshape(B, R, S, -1), out['sigma'].reshape(B, R, S, 1)


bench("fine run_model (dfine coords)", jax.jit(fine_model), planes, dfine)

u = bench("unify_samples FULL outputs", jax.jit(
    lambda *a: RD.unify_samples(*a)), d1, c1, s1, d2, c2, s2)


def unify_multisort(d1, c1, s1, d2, c2, s2):
    ad = jnp.concatenate([d1, d2], -2)[..., 0]
    ac = jnp.concatenate([c1, c2], -2)
    asg = jnp.concatenate([s1, s2], -2)[..., 0]
    ops = [ad] + [ac[..., i] for i in range(ac.shape[-1])] + [asg]
    res = jax.lax.sort(ops, dimension=-1, num_keys=1)
    sd = res[0][..., None]
    sc = jnp.stack(res[1:1 + ac.shape[-1]], -1)
    ss = res[-1][..., None]
    return sd, sc, ss


u2 = bench("unify via multi-operand lax.sort", jax.jit(unify_multisort),
           d1, c1, s1, d2, c2, s2)
for a, b in zip(u, u2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
print("multisort EXACT", flush=True)

bench("final marcher (96)", jax.jit(
    lambda c_, s_, d_: mip_ray_marcher2(c_, s_, d_, opts)[0]),
    u[1], u[2], u[0])
