"""Trusted-protocol stage profiler: each stage is ONE jit whose inputs are
derived on-device from a fresh host scalar per call, so the remote client
cannot dedup dispatches and XLA cannot constant-fold the stage away.

PROF_B (batch, default 8), PROF_FP32=1 for parity dtype.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator

B = int(os.environ.get('PROF_B', '8'))
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4,
                      force_fp32=os.environ.get('PROF_FP32', '0') == '1')
params = G.init(jax.random.PRNGKey(0))
params = jax.device_put(params)
c = jnp.asarray(ge._camera_batch(B))
v = jnp.asarray(ge._verts_batch(B))


def probe(name, fn, iters=8):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(params, jnp.float32(0.5))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(params, jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1000:9.1f} ms   [compile {compile_s:.0f}s]",
          flush=True)
    return dt


def mk_z(eps):
    k = jax.random.fold_in(jax.random.PRNGKey(7), (eps * 1e6).astype(jnp.int32))
    return jax.random.normal(k, (B, 512)) * eps


def mk_ws(p, eps):
    return G.mapping(p, mk_z(eps), c)


n_tex = G.texture_backbone.num_ws

stages = {}

def full(p, eps):
    return G(p, mk_z(eps), c, v, noise_mode='const')['image']
stages['FULL'] = probe("FULL forward 512^2", full)

def tex(p, eps):
    ws = mk_ws(p, eps)
    return G.texture_backbone.synthesis(p['texture_backbone']['synthesis'],
                                        ws[:, n_tex:], noise_mode='const',
                                        force_fp32=G.force_fp32)
stages['texture'] = probe("texture backbone 256^2x32", tex)

def stat(p, eps):
    ws = mk_ws(p, eps)
    return G.backbone.synthesis(p['backbone']['synthesis'], ws[:, :n_tex],
                                noise_mode='const', force_fp32=G.force_fp32)
stages['static'] = probe("static backbone 256^2x96", stat)

def rast(p, eps):
    t = tex(p, eps)
    return G.rasterize(p, v[:, :5023], v[:, 5023:], t)
t_rast = probe("tex + rasterize 4 views", rast)
stages['rasterize'] = t_rast - stages['texture']
print(f"{'  -> rasterize alone':34s} {stages['rasterize']*1000:9.1f} ms")

def mouth(p, eps):
    ws = mk_ws(p, eps)
    imgs, alphas, lm2d = rast(p, eps)
    return G._mouth_pipeline(p, imgs[0], lm2d, ws[:, :n_tex], 'const', None)
t_m = probe("tex + rast + mouth/blend", mouth)
stages['mouth'] = t_m - t_rast
print(f"{'  -> mouth/blend alone':34s} {stages['mouth']*1000:9.1f} ms")

def planes(p, eps):
    ws = mk_ws(p, eps)
    return G.build_planes(p, ws, v, noise_mode='const')[0]
t_pl = probe("build_planes (all)", planes)

from next3d_tpu.render.ray_sampler import sample_rays
ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4), c[:, 16:25].reshape(-1, 3, 3), 64)

def rend(p, eps):
    pl = planes(p, eps)
    return G.renderer(None, pl, (p['decoder'], G.decoder), ro, rd,
                      G.rendering_kwargs)[0]
t_r = probe("planes + volume render", rend)
stages['render'] = t_r - t_pl
print(f"{'  -> volume render alone':34s} {stages['render']*1000:9.1f} ms")

def sr(p, eps):
    ws = mk_ws(p, eps)
    feats = rend(p, eps)
    fi = feats.transpose(0, 2, 1).reshape(B, 32, 64, 64)
    return G.superresolution(p['superresolution'], fi[:, :3], fi,
                             ws[:, :n_tex], noise_mode='none',
                             force_fp32=G.force_fp32)
t_sr = probe("... + superresolution", sr)
stages['sr'] = t_sr - t_r
print(f"{'  -> SR alone':34s} {stages['sr']*1000:9.1f} ms")
print(f"\nFULL {stages['FULL']*1000:.1f} ms -> {B/stages['FULL']:.1f} img/s")
