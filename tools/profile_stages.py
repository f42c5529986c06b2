import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator

import os as _os
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4,
                      force_fp32=_os.environ.get('PROF_FP32','0')=='1')
params = G.init(jax.random.PRNGKey(0))
B = int(os.environ.get("PROF_B", "4"))
z = np.random.RandomState(0).randn(B, 512).astype(np.float32)
c = ge._camera_batch(B); v = ge._verts_batch(B)

ws = G.mapping(params, jnp.asarray(z), jnp.asarray(c))
n_tex = G.texture_backbone.num_ws
eg3d_ws, texture_ws = ws[:, :n_tex], ws[:, n_tex:]

def bench(name, fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1000:9.1f} ms")
    return out

tex_fn = jax.jit(lambda p, w: G.texture_backbone.synthesis(p['texture_backbone']['synthesis'], w, noise_mode='const'))
textures = bench("texture_backbone 256^2x32", tex_fn, params, texture_ws)

static_fn = jax.jit(lambda p, w: G.backbone.synthesis(p['backbone']['synthesis'], w, noise_mode='const'))
bench("static backbone 256^2x96", static_fn, params, eg3d_ws)

vv, lms = v[:, :5023], v[:, 5023:]
rast_fn = jax.jit(lambda p, vv, lms, tex: G.rasterize(p, vv, lms, tex))
imgs, alphas, lm2d = bench("rasterize 4 views (w/ fill)", rast_fn, params, jnp.asarray(vv), jnp.asarray(lms), textures)

# rasterize without fill_mouth
G.fill_mouth = False
rast_fn2 = jax.jit(lambda p, vv, lms, tex: G.rasterize(p, vv, lms, tex))
bench("rasterize 4 views (no fill)", rast_fn2, params, jnp.asarray(vv), jnp.asarray(lms), textures)
G.fill_mouth = True

mouth_fn = jax.jit(lambda p, img, lm, w: G._mouth_pipeline(p, img, lm, w, 'const', None))
blended_front = bench("mouth+blend StyleUNets", mouth_fn, params, imgs[0], lm2d, eg3d_ws)

planes_fn = jax.jit(lambda p, w, v: G.build_planes(p, w, v, noise_mode='const')[0])
planes = bench("build_planes (all)", planes_fn, params, ws, jnp.asarray(v))

from next3d_tpu.render.ray_sampler import sample_rays
ro, rd = sample_rays(jnp.asarray(c[:, :16].reshape(-1,4,4)), jnp.asarray(c[:,16:25].reshape(-1,3,3)), 64)
rend_fn = jax.jit(lambda p, pl, ro, rd: G.renderer(None, pl, (p['decoder'], G.decoder), ro, rd, G.rendering_kwargs)[0])
feats = bench("volume render 64^2 x96", rend_fn, params, planes, ro, rd)

feat_img = feats.transpose(0,2,1).reshape(B, 32, 64, 64)
sr_fn = jax.jit(lambda p, rgb, x, w: G.superresolution(p['superresolution'], rgb, x, w, noise_mode='none'))
bench("superresolution 512^2", sr_fn, params, feat_img[:, :3], feat_img, eg3d_ws)

full_fn = jax.jit(lambda p, z, c, v: G(p, z, c, v, noise_mode='const')['image'])
bench("FULL forward", full_fn, params, jnp.asarray(z), jnp.asarray(c), jnp.asarray(v), iters=3)
