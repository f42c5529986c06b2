import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import __graft_entry__ as ge
from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.render.rasterizer import rasterize_mesh_tiled
from next3d_tpu.ops.pallas_raster import rasterize_mesh_pallas
from next3d_tpu.render import renderer as R
from next3d_tpu.models.osg_decoder import OSGDecoder

def bench(name, fn, *args, iters=3, vary=0):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a0 = args[0] + jnp.float32(i*1e-6) if vary else args[0]
        out = fn(a0, *args[1:])
    got = jax.tree.leaves(out)[0]
    _ = np.asarray(got.ravel()[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms", flush=True)
    return out

B = 4
v = ge._verts_batch(B)
vv = jnp.asarray(v[:, :5023])
tv = jnp.tile(vv, (4,1,1))
G = TriPlaneGenerator(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                      img_channels=3, topology_path=ge.DEMO_OBJ,
                      rendering_kwargs=ge.RENDER_KW_FFHQ, sr_num_fp16_res=4,
                      force_fp32=False, rasterizer_impl='pallas')
faces = jnp.asarray(G.faces)
bench("pallas raster 16 meshes", jax.jit(lambda t: rasterize_mesh_pallas(t, faces, 256)[0]), tv, vary=1)
bench("tiled raster 16 meshes", jax.jit(lambda t: rasterize_mesh_tiled(t, faces, 256)[0]), tv, vary=1)

rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 32, 256, 256).astype(np.float32))
coords = jnp.asarray((rng.rand(B, 786432, 3).astype(np.float32) - .5))
bench("sample_from_planes (tala)", jax.jit(lambda p, c: R.sample_from_planes(p, c, 1.0)), planes, coords, vary=1)

dec = OSGDecoder(32, {'decoder_lr_mul': 1, 'decoder_output_dim': 32})
dparams = dec.init(jax.random.PRNGKey(0))
OPTS = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=48,
            depth_resolution_importance=48, disparity_space_sampling=False,
            clamp_mode='softplus')
ro = jnp.asarray(rng.rand(B, 4096, 3).astype(np.float32))
rd = jnp.asarray(rng.randn(B, 4096, 3).astype(np.float32)); rd = rd/jnp.linalg.norm(rd,axis=-1,keepdims=True)
rend = R.ImportanceRenderer()
bench("FULL renderer (fixed)", jax.jit(lambda p, ro, rd: rend(None, p, (dparams, dec), ro, rd, OPTS)[0]), planes, ro, rd, vary=1)

params = G.init(jax.random.PRNGKey(0))
z = np.random.RandomState(0).randn(B, 512).astype(np.float32)
c = ge._camera_batch(B)
full = jax.jit(lambda z, p, c, v: G(p, z, c, v, noise_mode='const')['image'])
bench("FULL forward (pallas raster)", full, jnp.asarray(z), params, jnp.asarray(c), jnp.asarray(v), iters=3, vary=1)
