"""Render-internals profiler (device-resident-args protocol).

Times the pieces of the two-pass volume render at the bench operating point
(B=8, 64^2 rays, 48+48 depths, 256^2 x 32ch planes, bf16 gather tables).
Protocol: args live on device, same args every call, large outputs —
the only dispatch pattern whose timings proved consistent with bench.py
on the axon runtime (synthetic varied-input probes get elided).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as ge
from next3d_tpu.render import renderer as R
from next3d_tpu.render.ray_sampler import sample_rays
from next3d_tpu.render.ray_marcher import mip_ray_marcher2
from next3d_tpu.models.osg_decoder import OSGDecoder

B = int(os.environ.get('PROF_B', '8'))
S = 48
opts = dict(ge.RENDER_KW_FFHQ)
opts['gather_bf16'] = os.environ.get('PROF_FP32', '0') != '1'

planes = jax.device_put(jnp.asarray(
    np.random.RandomState(0).randn(B, 3, 32, 256, 256), jnp.float32))
c = ge._camera_batch(B)
ro, rd = sample_rays(jnp.asarray(c[:, :16].reshape(-1, 4, 4)),
                     jnp.asarray(c[:, 16:25].reshape(-1, 3, 3)), 64)
ro, rd = jax.device_put(ro), jax.device_put(rd)
dec = OSGDecoder(32, {'decoder_lr_mul': 1.0, 'decoder_output_dim': 32})
dparams = jax.device_put(dec.init(jax.random.PRNGKey(1)))

depths = R.sample_stratified(None, ro, opts['ray_start'], opts['ray_end'], S)
coords = (ro[:, :, None] + depths * rd[:, :, None]).reshape(B, -1, 3)
dirs = jnp.broadcast_to(rd[:, :, None], (B, 4096, S, 3)).reshape(B, -1, 3)
coords, dirs, depths = jax.device_put((coords, dirs, depths))


def bench(name, fn, *args, iters=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    csec = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1000:9.2f} ms  [c {csec:.0f}s]", flush=True)
    return dt


# 1. one sampling pass (the gather): (B, M, 3) -> (B, 3, M, 32)
bench("sample_from_planes coarse (1.57M pts)",
      lambda p, co: R.sample_from_planes(p, co, box_warp=opts['box_warp'],
                                         gather_bf16=opts['gather_bf16']),
      planes, coords)

feats = jax.device_put(R.sample_from_planes(planes, coords, opts['box_warp']))

# 2. decoder MLP
bench("OSGDecoder MLP (1.57M pts)",
      lambda dp, f: dec(dp, f, None)['rgb'], dparams, feats)

# 3. run_model = sample + decode
bench("run_model (sample+decode)",
      lambda p, co: R.ImportanceRenderer().run_model(
          p, (dparams, dec), co, None, opts), planes, coords)

rgb = jax.device_put(jnp.zeros((B, 4096, S, 32)))
sig = jax.device_put(jnp.ones((B, 4096, S, 1)))

# 4. ray marcher
bench("mip_ray_marcher2 (48)",
      lambda cg, sg, dp: mip_ray_marcher2(cg, sg, dp, opts)[0],
      rgb, sig, depths)

# 5. importance sampling (smooth + inverse-CDF)
w = jax.device_put(jnp.abs(np.random.RandomState(1).randn(B, 4096, S - 1, 1))
                   .astype(np.float32))
bench("sample_importance (pdf invcdf)",
      lambda z, ww: R.sample_importance(None, z, ww, S), depths, w)

# 6. unify sort-merge (96 per ray)
d2 = jax.device_put(depths + 0.01)
bench("unify_samples sort (96/ray)",
      lambda a, b_, c_, d_, e_, f_: R.unify_samples(a, b_, c_, d_, e_, f_)[0],
      depths, rgb, sig, d2, rgb, sig)

# 7. full renderer
bench("FULL two-pass render",
      lambda p, o, d: R.ImportanceRenderer()(None, p, (dparams, dec), o, d,
                                             opts),
      planes, ro, rd, iters=5)
