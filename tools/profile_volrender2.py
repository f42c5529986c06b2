"""Volume-render sub-stage breakdown at the bench operating point
(batch 8, 64^2 rays, 48+48, bf16 gather tables) with the trusted protocol:
each stage is ONE jit whose inputs derive from a fresh host scalar, so the
remote client cannot dedup dispatches.

PV_BATCH (default 8), PV_FP32=1 to disable bf16 gathers.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from next3d_tpu.models.osg_decoder import OSGDecoder
from next3d_tpu.render import renderer as RD
from next3d_tpu.render.ray_marcher import mip_ray_marcher2
from next3d_tpu.render.ray_sampler import sample_rays

B = int(os.environ.get('PV_BATCH', '8'))
FP32 = os.environ.get('PV_FP32', '0') == '1'
S = 48
R = 64 * 64
opts = dict(ge.RENDER_KW_FFHQ)
opts['gather_bf16'] = not FP32

dec = OSGDecoder(32, {'decoder_lr_mul': 1, 'decoder_output_dim': 32})
dec_params = jax.device_put(dec.init(jax.random.PRNGKey(0)))

c = ge._camera_batch(B)
ro, rd = sample_rays(jnp.asarray(c[:, :16].reshape(-1, 4, 4)),
                     jnp.asarray(c[:, 16:25].reshape(-1, 3, 3)), 64)
ro, rd = jax.block_until_ready((ro, rd))
planes0 = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(1), (B, 3, 32, 256, 256)))


def probe(name, fn, iters=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(jnp.float32(0.5))
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:9.1f} ms   [compile {comp:.0f}s]", flush=True)
    return dt


def mk_planes(eps):
    return planes0 * (1 + eps * 1e-3)


def mk_depths(eps):
    return RD.sample_stratified(None, ro, 2.25, 3.3, S) + eps * 1e-6


def mk_coords(eps):
    d = mk_depths(eps)
    co = (ro[:, :, None] + d * rd[:, :, None]).reshape(B, -1, 3)
    di = jnp.broadcast_to(rd[:, :, None], (B, R, S, 3)).reshape(B, -1, 3)
    return d, co, di


t_co = probe("coords (stratified+fma)",
             lambda e: mk_coords(e)[1])

t_gather = probe(f"sample_from_planes {B * R * S // 1000}k pts "
                 f"({'f32' if FP32 else 'bf16'})",
                 lambda e: RD.sample_from_planes(
                     mk_planes(e), mk_coords(e)[1], 1.0,
                     gather_bf16=not FP32))
print(f"{'  -> gather alone':44s} {(t_gather - t_co)*1000:9.1f} ms")

t_dec = probe("gather + decoder MLP",
              lambda e: dec(dec_params,
                            RD.sample_from_planes(mk_planes(e),
                                                  mk_coords(e)[1], 1.0,
                                                  gather_bf16=not FP32),
                            None)['rgb'])
print(f"{'  -> decoder alone':44s} {(t_dec - t_gather)*1000:9.1f} ms")


def run_pass(e):
    d, co, di = mk_coords(e)
    out = RD.ImportanceRenderer.run_model(
        None, mk_planes(e), (dec_params, dec), co, di, opts)
    return out['rgb'].reshape(B, R, S, -1), out['sigma'].reshape(B, R, S, 1), d


t_pass = probe("one full pass (run_model)", lambda e: run_pass(e)[0])


def march(e):
    colors, dens, d = run_pass(e)
    return mip_ray_marcher2(colors, dens, d, opts)[2]


t_march = probe("pass + marcher", march)
print(f"{'  -> marcher alone':44s} {(t_march - t_pass)*1000:9.1f} ms")


def imp(e):
    colors, dens, d = run_pass(e)
    w = mip_ray_marcher2(colors, dens, d, opts)[2]
    return RD.sample_importance(None, d, w, 48)


t_imp = probe("pass + marcher + sample_importance", imp)
print(f"{'  -> sample_importance alone':44s} {(t_imp - t_march)*1000:9.1f} ms")


def uni(e):
    colors, dens, d = run_pass(e)
    w = mip_ray_marcher2(colors, dens, d, opts)[2]
    dfine = RD.sample_importance(None, d, w, 48)
    return RD.unify_samples(d, colors, dens, dfine, colors, dens)[0]


t_uni = probe("... + unify (sort-merge 96)", uni)
print(f"{'  -> unify alone':44s} {(t_uni - t_imp)*1000:9.1f} ms")

rend = RD.ImportanceRenderer()
t_full = probe("FULL renderer (2-pass 48+48)",
               lambda e: rend(None, mk_planes(e), (dec_params, dec),
                              ro, rd, opts)[0], iters=6)
print(f"\nfull {t_full*1000:.1f} ms; accounted ~"
      f"{(2*t_pass + (t_march-t_pass) + (t_imp-t_march) + (t_uni-t_imp) + (t_march-t_pass))*1000:.1f} ms"
      f" (2x pass + marcher x2 + importance + unify)")
