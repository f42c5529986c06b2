"""Ray/sample-axis sharding for shape extraction (SURVEY section 5.7,
VERDICT r2 #8): sigma decoding with the sample axis sharded across the
8-device CPU mesh must equal the single-device result — planes and params
replicated, coords split, no collectives (reference chunk-loops on one
GPU, gen_samples_next3d.py:210-226)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.parallel.mesh import data_parallel_mesh
from next3d_tpu.utils.obj_io import load_lms, load_obj

DEMO = "/root/reference/data/demo"
RK = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=8,
          depth_resolution_importance=8, disparity_space_sampling=False,
          clamp_mode='softplus', c_gen_conditioning_zero=True, c_scale=1.0,
          superresolution_module='SuperresolutionHybrid2X',
          superresolution_noise_mode='none', sr_antialias=True)


def test_sharded_sigma_grid_matches_single_device():
    assert len(jax.devices()) == 8, "conftest forces an 8-device CPU mesh"
    mesh = load_obj(f"{DEMO}/demo.obj")
    lms = load_lms(f"{DEMO}/demo_kpt2d.txt")
    v = np.concatenate([mesh.verts, lms])[None].astype(np.float32)

    G = TriPlaneGenerator(
        z_dim=64, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology_path=f"{DEMO}/demo.obj", rendering_kwargs=RK,
        channel_base=2048, channel_max=64)
    params = G.init(jax.random.PRNGKey(0))

    z = jnp.asarray(np.random.RandomState(3).randn(1, 64), jnp.float32)
    c = jnp.zeros((1, 25), jnp.float32)
    ws = G.mapping(params, z, c)
    planes, _ = G.build_planes(params, ws, jnp.asarray(v),
                               noise_mode='const')

    coords = np.random.RandomState(7).uniform(
        -0.5, 0.5, (1, 4096, 3)).astype(np.float32)

    def decode(planes, coords):
        return G.sample_with_planes(params, planes, coords, coords)['sigma']

    ref = np.asarray(jax.jit(decode)(planes, jnp.asarray(coords)))

    dp = data_parallel_mesh()
    shard = NamedSharding(dp, P(None, 'data', None))
    sharded_in = jax.device_put(coords, shard)
    out = jax.jit(decode)(planes, sharded_in)
    # result really is computed sharded over the sample axis
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
