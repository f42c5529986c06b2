"""Bisect: why does sample_from_planes take 85 ms with ray-derived coords
but 0.3 ms with synthetic uniform coords?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import __graft_entry__ as ge  # noqa: E402
from next3d_tpu.render import renderer as R  # noqa: E402
from next3d_tpu.render.ray_sampler import sample_rays  # noqa: E402

B = 8
ITERS = 8
S = 48

c = jnp.asarray(ge._camera_batch(B))
ro, rd = sample_rays(c[:, :16].reshape(-1, 4, 4),
                     c[:, 16:25].reshape(-1, 3, 3), 64)
ro = jax.device_put(ro)
rd = jax.device_put(rd)
# host-materialized copies of the REAL coords (same values, no ray math
# in-graph)
_d = R.sample_stratified(None, ro, 2.25, 3.3, S, False)
_coords_real = np.asarray((ro[:, :, None] + _d * rd[:, :, None])
                          .reshape(B, -1, 3))


def timeit(name, fn):
    f = jax.jit(fn)
    out = f(jnp.float32(0.5))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(jnp.float32(0.1 + 0.8 * np.random.rand()))
    jax.block_until_ready(out)
    print(f"{name:58s} {(time.perf_counter() - t0) / ITERS * 1000:8.2f} ms",
          flush=True)


def mk_planes(eps):
    k = jax.random.fold_in(jax.random.PRNGKey(3), (eps * 1e6).astype(jnp.int32))
    return jax.random.normal(k, (B, 3, 32, 256, 256), jnp.float32)


def mk_coords_ray(eps):
    d = R.sample_stratified(None, ro, 2.25, 3.3, S, False) + eps * 1e-6
    return (ro[:, :, None] + d * rd[:, :, None]).reshape(B, -1, 3)


coords_const = jnp.asarray(_coords_real)


def main():
    print(f"device={jax.devices()[0]}")

    def a(eps):
        return R.sample_from_planes(mk_planes(eps),
                                    mk_coords_ray(eps), box_warp=1.0,
                                    gather_bf16=True)
    timeit("A: planes-random + coords RAY-DERIVED in-graph", a)

    def b(eps):
        return R.sample_from_planes(mk_planes(eps), coords_const + eps * 1e-6,
                                    box_warp=1.0, gather_bf16=True)
    timeit("B: planes-random + REAL coords as device constant", b)

    def c_(eps):
        k = jax.random.fold_in(jax.random.PRNGKey(9),
                               (eps * 1e6).astype(jnp.int32))
        coords = jax.random.uniform(k, (B, S * 4096, 3), jnp.float32, -1.2, 1.2)
        return R.sample_from_planes(mk_planes(eps), coords, box_warp=1.0,
                                    gather_bf16=True)
    timeit("C: planes-random + uniform coords incl out-of-box", c_)

    def d_(eps):
        coords = mk_coords_ray(eps)
        coords = jax.lax.optimization_barrier(coords)
        return R.sample_from_planes(mk_planes(eps), coords, box_warp=1.0,
                                    gather_bf16=True)
    timeit("D: ray-derived coords BARRIERED before sampling", d_)


if __name__ == '__main__':
    main()
