import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.render.rasterizer import rasterize_mesh_tiled, rasterize_mesh

G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4,
                      force_fp32=False)
params = G.init(jax.random.PRNGKey(0))
B = 4
z = np.random.RandomState(0).randn(B, 512).astype(np.float32)
c = ge._camera_batch(B); v = ge._verts_batch(B)
ws = G.mapping(params, jnp.asarray(z), jnp.asarray(c))

def bench(name, fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms", flush=True)
    return out

# raster variations: 16 meshes (4 views x batch4)
vv = jnp.asarray(v[:, :5023])
tv = jnp.tile(vv, (4,1,1))
faces = jnp.asarray(G.faces)
for cap, tc in ((448, 32), (448, 128), (128, 32), (64, 32)):
    f = jax.jit(lambda t: rasterize_mesh_tiled(t, faces, 256, capacity=cap, tile_chunk=tc)[0])
    bench(f"tiled raster cap={cap} tc={tc}", f, tv)
f = jax.jit(lambda t: rasterize_mesh(t, faces, 256)[0])
bench("scatter raster", f, tv)

# renderer after gather fix
planes, eg3d_ws = jax.jit(lambda p, w, v: G.build_planes(p, w, v, noise_mode='const'))(params, ws, jnp.asarray(v))
from next3d_tpu.render.ray_sampler import sample_rays
ro, rd = sample_rays(jnp.asarray(c[:, :16].reshape(-1,4,4)), jnp.asarray(c[:,16:25].reshape(-1,3,3)), 64)
rend = jax.jit(lambda p, pl, ro, rd: G.renderer(None, pl, (p['decoder'], G.decoder), ro, rd, G.rendering_kwargs)[0])
bench("volume render (row-gather)", rend, params, planes, ro, rd)

full = jax.jit(lambda p, z, c, v: G(p, z, c, v, noise_mode='const')['image'])
bench("FULL forward", full, params, jnp.asarray(z), jnp.asarray(c), jnp.asarray(v), iters=3)
