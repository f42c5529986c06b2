import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from next3d_tpu.render import renderer as R
from next3d_tpu.render.ray_marcher import mip_ray_marcher2
from next3d_tpu.models.osg_decoder import OSGDecoder

B, Rays, S = 4, 4096, 48
M = Rays * S
rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 32, 256, 256).astype(np.float32))
coords = jnp.asarray((rng.rand(B, M, 3).astype(np.float32) - .5))
dec = OSGDecoder(32, {'decoder_lr_mul': 1, 'decoder_output_dim': 32})
dparams = dec.init(jax.random.PRNGKey(0))
OPTS = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=S,
            depth_resolution_importance=S, disparity_space_sampling=False,
            clamp_mode='softplus')


def bench(name, fn, *args, iters=5):
    # vary the first arg per iteration (defeats any caching of identical
    # dispatches in the remote-TPU client) and force host materialization
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        first = args[0] + jnp.float32(i * 1e-6)
        out = fn(first, *args[1:])
    got = jax.tree.leaves(out)[0]
    _ = np.asarray(got[(0,) * got.ndim])
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms",
          flush=True)
    return out


feats = bench("sample_from_planes 786k pts",
              jax.jit(lambda p, c: R.sample_from_planes(p, c, 1.0)),
              planes, coords)
bench("decoder MLP", jax.jit(lambda dp, f: dec(dp, f)['rgb']), dparams, feats)

colors = jnp.asarray(rng.rand(B, Rays, S, 32).astype(np.float32))
dens = jnp.asarray(rng.randn(B, Rays, S, 1).astype(np.float32))
depths = jnp.asarray(np.sort(rng.rand(B, Rays, S, 1).astype(np.float32) + 2, axis=2))
bench("ray marcher", jax.jit(lambda c, d, z: mip_ray_marcher2(c, d, z, OPTS)[0]),
      colors, dens, depths)

w = jnp.asarray(rng.rand(B, Rays, S - 1, 1).astype(np.float32))
bench("sample_importance",
      jax.jit(lambda z, w: R.sample_importance(None, z, w, S)), depths, w)

d2 = depths + 0.01
bench("unify(sort+gathers)",
      jax.jit(lambda a, b, c, d, e, f: R.unify_samples(a, b, c, d, e, f)[1]),
      depths, colors, dens, d2, colors, dens)

ro = jnp.asarray(rng.rand(B, Rays, 3).astype(np.float32))
rd = jnp.asarray(rng.randn(B, Rays, 3).astype(np.float32))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
rend = R.ImportanceRenderer()
bench("FULL renderer",
      jax.jit(lambda p, ro, rd: rend(None, p, (dparams, dec), ro, rd, OPTS)[0]),
      planes, ro, rd, iters=3)
