"""Microbenchmark the rasterizer hot path on real TPU: where do the 962ms go?

Builds the exact (V*N, 5023, 3) projected-vertex tensor the flagship model
feeds to rasterize_with_attributes (batch 4 x 4 views @ 256^2) and times
the full tiled path plus its isolated pieces (top_k binning, candidate
gathers, per-pixel tests) and the scatter alternative.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator

B = int(os.environ.get('PR_BATCH', '4'))
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4)
params = G.init(jax.random.PRNGKey(0))
v = jnp.asarray(ge._verts_batch(B))
vv, lms = v[:, :5023], v[:, 5023:]

# build the projected verts exactly as G.rasterize does
from next3d_tpu.render.mesh import batch_orth_proj
from next3d_tpu.models.triplane_next3d import RENDERING_VIEWS
V = len(RENDERING_VIEWS)
tforms = jnp.asarray(G.view_tforms)
flip = jnp.asarray([1., -1., 1.])
v_flip = (vv * flip)[None]
tv = jnp.einsum('vnpc,vcd->vnpd',
                jnp.broadcast_to(v_flip, (V,) + v_flip.shape[1:]), tforms)
tv = (tv + params['orth_shift']) * params['orth_scale']
tv = tv.reshape(V * B, 5023, 3)
tv = batch_orth_proj(tv, jnp.asarray([1., 0., 0.]))
tv = tv.at[:, :, 1:].multiply(-1)
tv = tv.at[:, :, 2].add(10.0)
tv = jax.block_until_ready(tv)
faces = jnp.asarray(G.faces).astype(jnp.int32)
F = faces.shape[0]
IMG = 256
print(f"verts {tv.shape} faces {F} image {IMG}")


def bench(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1000:9.1f} ms")
    return out


from next3d_tpu.render import rasterizer as R

bench("tiled full (cap 448)", jax.jit(
    lambda v: R.rasterize_mesh_tiled(v, faces, IMG, capacity=448)), tv)
bench("tiled full (cap 256)", jax.jit(
    lambda v: R.rasterize_mesh_tiled(v, faces, IMG, capacity=256)), tv)

# ---- isolated: the top_k binning over (B, T, F)
tile = 8
Tx = IMG // tile
T = Tx * Tx


def binning_only(verts):
    px = (verts[..., 0] + 1) * (IMG / 2) - 0.5
    py = (verts[..., 1] + 1) * (IMG / 2) - 0.5
    fx = px[:, faces]
    fy = py[:, faces]
    fz = verts[..., 2][:, faces]
    xmin = jnp.min(fx, -1); xmax = jnp.max(fx, -1)
    ymin = jnp.min(fy, -1); ymax = jnp.max(fy, -1)
    zmin = jnp.min(fz, -1)
    ty = (jnp.arange(T, dtype=jnp.float32) // Tx) * tile
    tx = (jnp.arange(T, dtype=jnp.float32) % Tx) * tile
    ox = (xmin[:, None, :] <= tx[None, :, None] + (tile - 1)) & \
         (xmax[:, None, :] >= tx[None, :, None])
    oy = (ymin[:, None, :] <= ty[None, :, None] + (tile - 1)) & \
         (ymax[:, None, :] >= ty[None, :, None])
    ov = ox & oy
    score = jnp.where(ov, -zmin[:, None, :], -jnp.inf)
    _, kid = jax.lax.top_k(score, 448)
    return kid

kid = bench("binning: overlap + top_k(448) only", jax.jit(binning_only), tv)

def overlap_only(verts):
    px = (verts[..., 0] + 1) * (IMG / 2) - 0.5
    py = (verts[..., 1] + 1) * (IMG / 2) - 0.5
    fx = px[:, faces]; fy = py[:, faces]
    xmin = jnp.min(fx, -1); xmax = jnp.max(fx, -1)
    ymin = jnp.min(fy, -1); ymax = jnp.max(fy, -1)
    ty = (jnp.arange(T, dtype=jnp.float32) // Tx) * tile
    tx = (jnp.arange(T, dtype=jnp.float32) % Tx) * tile
    ox = (xmin[:, None, :] <= tx[None, :, None] + (tile - 1)) & \
         (xmax[:, None, :] >= tx[None, :, None])
    oy = (ymin[:, None, :] <= ty[None, :, None] + (tile - 1)) & \
         (ymax[:, None, :] >= ty[None, :, None])
    return jnp.sum(ov := (ox & oy), axis=-1)

bench("binning: overlap only (no top_k)", jax.jit(overlap_only), tv)

# ---- isolated: candidate gathers (B, T, K) from (B, F)
def gathers_only(verts, kid):
    px = (verts[..., 0] + 1) * (IMG / 2) - 0.5
    fx = px[:, faces]  # (B,F,3)
    out = 0
    for i in range(4):  # gather 4 per-face columns like chunk_fn does
        out = out + jnp.take_along_axis(
            fx[..., i % 3][:, None], kid, axis=2)
    return out

bench("candidate gathers (4 cols x T x 448)", jax.jit(gathers_only), tv, kid)

# ---- scatter-min raw throughput: 10M updates into (16, 65536)
upd = jax.random.randint(jax.random.PRNGKey(0), (16, 650_000), 0, 65536)
val = jax.random.uniform(jax.random.PRNGKey(1), (16, 650_000))
def scatter_min(upd, val):
    zb = jnp.full((16, 65536), 1e10)
    return jax.vmap(lambda z, p, x: z.at[p].min(x))(zb, upd, val)
bench("scatter-min 10.4M updates", jax.jit(scatter_min), upd, val)

# ---- old scatter rasterizer with patch 16 (exact path)
bench("scatter raster (patch 32)", jax.jit(
    lambda v: R.rasterize_mesh(v, faces, IMG, patch=32)), tv, iters=2)
