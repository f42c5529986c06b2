import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from next3d_tpu.ops.pallas_triplane import sample_from_planes_fused
from next3d_tpu.render.renderer import sample_from_planes
from next3d_tpu.render.ray_sampler import sample_rays
from next3d_tpu.render import camera_utils
import math

B = 4
rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 32, 256, 256).astype(np.float32))
cam = camera_utils.lookat_pose(math.pi/2, math.pi/2, jnp.asarray([0,0,0.2]), radius=2.7)
c2w = jnp.tile(cam, (B,1,1))
K = jnp.tile(jnp.asarray(camera_utils.fov_to_intrinsics(18.837))[None], (B,1,1))
ro, rd = sample_rays(c2w, K, 64)
depths = jnp.linspace(2.25, 3.3, 96)
coords = (ro[:, :, None] + depths[None, None, :, None] * rd[:, :, None]).reshape(B, -1, 3)
print('M =', coords.shape[1], flush=True)

def bench(name, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(args[0] + jnp.float32(i*1e-6), *args[1:])
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1000:9.1f} ms", flush=True)
    return out

w = bench("XLA sample_from_planes", jax.jit(lambda p, c: sample_from_planes(p, c, 1.0)), planes, coords)
g = bench("FUSED sample_from_planes", jax.jit(lambda p, c: sample_from_planes_fused(p, c, 1.0)), planes, coords)
d = float(jnp.max(jnp.abs(w - g)))
print("max |diff| =", d, flush=True)
