"""Break down the 340ms rasterize stage (4 views, batch 4, 256^2)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.render import rasterizer as RZ
from next3d_tpu.render.fill_mouth import fill_mouth
from next3d_tpu.ops import grid_sample_2d
from next3d_tpu.ops.pallas_raster import rasterize_mesh_pallas_binned

B = 4
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4)
params = G.init(jax.random.PRNGKey(0))
v = ge._verts_batch(B)
vv, lms = jnp.asarray(v[:, :5023]), jnp.asarray(v[:, 5023:])
textures = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(1), (B, 32, 256, 256)))


def bench(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms",
          flush=True)
    return out


# reproduce the transformed verts (16 = 4 views x batch 4) like the model
flip = jnp.asarray([1., -1., 1.])
from next3d_tpu.render.mesh import batch_orth_proj
tf = jnp.asarray(G.view_tforms)
vf = (vv * flip)[None]
tv = jnp.einsum('vnpc,vcd->vnpd',
                jnp.broadcast_to(vf, (4,) + vf.shape[1:]), tf)
tv = (tv + params['orth_shift']) * params['orth_scale']
tv = tv.reshape(16, 5023, 3)
tv = batch_orth_proj(tv, jnp.asarray([1., 0., 0.]))
tv = tv.at[:, :, 1:].multiply(-1)
tv = tv.at[:, :, 2].add(10.0)
tv = jax.block_until_ready(tv)
faces = jnp.asarray(G.faces)
attrs = jnp.broadcast_to(jnp.asarray(G.face_uvcoords)[None],
                         (16,) + G.face_uvcoords.shape)

p2f = bench("visibility (pallas_binned)", jax.jit(
    lambda tv: rasterize_mesh_pallas_binned(tv, faces, 256)[0]), tv)

bench("interpolate_face_attributes", jax.jit(
    lambda tv, p2f: RZ.interpolate_face_attributes(tv, faces, attrs, p2f,
                                                   256)), tv, p2f)

rendering = bench("full rasterize_with_attributes", jax.jit(
    lambda tv: RZ.rasterize_with_attributes(tv, faces, attrs, 256)), tv)

grid = jax.block_until_ready(
    jax.lax.stop_gradient(rendering[:, :2].transpose(0, 2, 3, 1)))
alpha = rendering[:, -1:]

eye_mask = jnp.broadcast_to(
    jnp.asarray(G.uv_face_mask)[None, None], (16, 1, 256, 256))
bench("eye-mask grid_sample", jax.jit(
    lambda grid: grid_sample_2d(eye_mask, grid)), grid)

tex16 = jnp.broadcast_to(textures[None], (4,) + textures.shape) \
    .reshape(16, 32, 256, 256)
bench("texture grid_sample (16x256^2x32)", jax.jit(
    lambda grid: grid_sample_2d(tex16, grid)), grid)

bench("fill_mouth", jax.jit(fill_mouth), jax.block_until_ready(alpha))

bench("FULL model rasterize()", jax.jit(
    lambda p, vv, lms, tex: G.rasterize(p, vv, lms, tex)),
    params, vv, lms, textures, iters=3)
