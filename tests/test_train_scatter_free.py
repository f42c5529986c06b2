"""Gmain/Dmain gradients with the scatter-free grid_sample backward forced.

On real TPU meshes the backward of every grid_sample (tri-plane sampling,
texture sampling, mouth crop/paste) routes through
ops/scatter_add.scatter_add_rows_batched instead of XLA scatter (which
serializes on TPU — BENCH_extra r4 pathology). The CPU suite otherwise
exercises only the autodiff-scatter path (the trace-time backend switch in
ops/grid_sample._use_scatter_free_bwd), so this file forces the TPU path
end-to-end through the GAN loss and checks gradients stay finite and match
the scatter oracle. Own file: fresh jit cache, so the env flag is seen at
trace time (reference loss: training_avatar_texture/loss.py:82-170)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.nn import DualDiscriminator
from next3d_tpu.train import LossConfig, StyleGAN2Loss
from next3d_tpu.utils.obj_io import load_obj, load_lms

DEMO = "/root/reference/data/demo/demo.obj"
KPT = "/root/reference/data/demo/demo_kpt2d.txt"

RENDER_KW = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0,
                 depth_resolution=4, depth_resolution_importance=4,
                 disparity_space_sampling=False, clamp_mode='softplus',
                 c_gen_conditioning_zero=False, c_scale=1.0,
                 superresolution_module='SuperresolutionHybrid2X',
                 superresolution_noise_mode='random', sr_antialias=True)


def test_gmain_grad_scatter_free_matches_scatter(rng, monkeypatch):
    import os
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    G = TriPlaneGenerator(
        z_dim=16, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology_path=DEMO, rendering_kwargs=RENDER_KW,
        channel_base=1024, channel_max=32, rasterizer_face_chunk=9976,
        plane_resolution=64, rasterizer_patch=12)
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=3,
                          channel_base=1024, channel_max=32)
    loss = StyleGAN2Loss(G, D, LossConfig(
        r1_gamma=4.0, gpc_reg_prob=None, density_reg=0.25,
        neural_rendering_resolution_initial=32, blur_init_sigma=0.0))
    params_G = G.init(jax.random.PRNGKey(0))
    params_D = D.init(jax.random.PRNGKey(1))

    n = 2
    mesh = load_obj(DEMO)
    lms = load_lms(KPT)
    v = np.concatenate([mesh.verts, lms], 0)[None].repeat(n, 0)
    import math
    from next3d_tpu.render import camera_utils
    cam = camera_utils.lookat_pose(math.pi / 2, math.pi / 2,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7)
    K = camera_utils.fov_to_intrinsics(18.837)
    c = np.concatenate([np.asarray(cam).reshape(1, 16),
                        K.reshape(1, 9)], 1).repeat(n, 0)
    batch = {'gen_z': jnp.asarray(rng.randn(n, 16), jnp.float32),
             'gen_c': jnp.asarray(c, jnp.float32),
             'gen_v': jnp.asarray(v, jnp.float32),
             'real_c': jnp.asarray(c, jnp.float32)}
    key = jax.random.PRNGKey(2)
    sched, nrr = loss.schedules(0)

    def gmain(p):
        l, aux = loss.gmain_loss(p, params_D, batch, key, sched, nrr)
        return l

    # oracle: the default CPU path (autodiff scatter-add)
    monkeypatch.setenv('NEXT3D_SCATTER_FREE_BWD', '0')
    g_ref = jax.grad(gmain)(params_G)
    # TPU path: sort + segmented scan, forced on CPU
    monkeypatch.setenv('NEXT3D_SCATTER_FREE_BWD', '1')
    g_sf = jax.grad(gmain)(params_G)

    leaves_ref, tree = jax.tree_util.tree_flatten(g_ref)
    leaves_sf, tree2 = jax.tree_util.tree_flatten(g_sf)
    assert tree == tree2
    for a, b in zip(leaves_ref, leaves_sf):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.isfinite(b).all()
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-4 * scale)
