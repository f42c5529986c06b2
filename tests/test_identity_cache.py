"""Identity-plane caching equivalence (SURVEY section 3.5 FPS lever;
VERDICT r2 #9): precomputing the ws-only identity work (neural texture +
static tri-plane) and resuming via `synthesis_from_identity` must produce
exactly the full `synthesis` output — this is the contract the reenact and
gen-videos fast paths rely on (reference recomputes identity per frame,
reenact_avatar_next3d.py:164)."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.utils.obj_io import load_lms, load_obj

DEMO = "/root/reference/data/demo"
RK = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=8,
          depth_resolution_importance=8, disparity_space_sampling=False,
          clamp_mode='softplus', c_gen_conditioning_zero=True, c_scale=1.0,
          superresolution_module='SuperresolutionHybrid2X',
          superresolution_noise_mode='none', sr_antialias=True)


def test_synthesis_from_identity_matches_full_synthesis():
    from next3d_tpu.render import camera_utils
    mesh = load_obj(f"{DEMO}/demo.obj")
    lms = load_lms(f"{DEMO}/demo_kpt2d.txt")
    v = np.concatenate([mesh.verts, lms])[None].astype(np.float32)

    G = TriPlaneGenerator(
        z_dim=64, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology_path=f"{DEMO}/demo.obj", rendering_kwargs=RK,
        channel_base=2048, channel_max=64)
    params = G.init(jax.random.PRNGKey(0))

    cam = camera_utils.lookat_pose(math.pi / 2, math.pi / 2,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7)
    K = camera_utils.fov_to_intrinsics(18.837)
    c = np.concatenate([np.asarray(cam).reshape(1, 16),
                        np.asarray(K).reshape(1, 9)], 1).astype(np.float32)
    z = np.random.RandomState(1).randn(1, 64).astype(np.float32)

    ws = G.mapping(params, jnp.asarray(z), jnp.asarray(c))
    full = G.synthesis(params, ws, c, v, noise_mode='const')

    # the cached path: identity work once (what reenact/gen-videos jit)
    n_tex = G.texture_backbone.num_ws
    eg3d_ws, texture_ws = ws[:, :n_tex], ws[:, n_tex:]
    textures = G.texture_backbone.synthesis(
        params['texture_backbone']['synthesis'], texture_ws,
        noise_mode='const')
    static = G.backbone.synthesis(params['backbone']['synthesis'], eg3d_ws,
                                  noise_mode='const')
    static = static.reshape(static.shape[0], 3, 32, *static.shape[-2:])
    cached = G.synthesis_from_identity(params, ws, textures, static, c, v,
                                       noise_mode='const')

    for key in ('image', 'image_raw', 'image_depth'):
        a, b = np.asarray(full[key]), np.asarray(cached[key])
        # identical ops on identical inputs; only compiler reassociation
        # between the two jitted graphs can differ
        assert np.allclose(a, b, atol=1e-5), (key, np.abs(a - b).max())
