"""Training-step tests: all four GAN phases run jitted over an 8-device CPU
mesh with the batch sharded on the data axis (substitutes the reference's
multi-GPU story; SURVEY section 2.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.nn import DualDiscriminator
from next3d_tpu.parallel import data_parallel_mesh, replicate, shard_batch
from next3d_tpu.train import LossConfig, StyleGAN2Loss, TrainStep, make_optimizer
from next3d_tpu.train.train_step import trainable_mask
from next3d_tpu.utils.obj_io import load_obj, load_lms

DEMO = "/root/reference/data/demo/demo.obj"
KPT = "/root/reference/data/demo/demo_kpt2d.txt"

RENDER_KW = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0,
                 depth_resolution=8, depth_resolution_importance=8,
                 disparity_space_sampling=False, clamp_mode='softplus',
                 c_gen_conditioning_zero=False, c_scale=1.0,
                 superresolution_module='SuperresolutionHybrid2X',
                 superresolution_noise_mode='random', sr_antialias=True)


@pytest.fixture(scope="module")
def setup():
    import os
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    # w_dim=512 is effectively fixed: the SR heads hardcode it, like the
    # reference (superresolution.py:39-41)
    G = TriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology_path=DEMO, rendering_kwargs=RENDER_KW,
        channel_base=1024, channel_max=64, rasterizer_face_chunk=9976,
        plane_resolution=64, rasterizer_patch=12)
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=3,
                          channel_base=1024, channel_max=64)
    cfg = LossConfig(r1_gamma=4.0, gpc_reg_prob=0.5, density_reg=0.25,
                     neural_rendering_resolution_initial=32,
                     blur_init_sigma=2.0, blur_fade_kimg=1.0)
    loss = StyleGAN2Loss(G, D, cfg)
    step = TrainStep(loss,
                     make_optimizer(0.0025, 0.0, 0.99, 1e-8, reg_interval=4),
                     make_optimizer(0.002, 0.0, 0.99, 1e-8, reg_interval=16),
                     mesh=data_parallel_mesh())
    state = step.init_state(jax.random.PRNGKey(0))
    return G, D, loss, step, state


def _batch(rng, n=8):
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
    return {
        'gen_z': rng.randn(n, 32).astype(np.float32),
        'gen_c': c.astype(np.float32),
        'gen_v': v.astype(np.float32),
        'real_c': c.astype(np.float32),
    }, rng.randn(n, 3, 128, 128).astype(np.float32)


def test_full_train_step_on_8dev_mesh(setup, rng):
    G, D, loss, step, state = setup
    assert jax.device_count() == 8
    mesh = data_parallel_mesh()

    batch, real = _batch(rng)
    batch = shard_batch(batch, mesh)
    real = shard_batch(real, mesh)
    state.params_G = replicate(state.params_G, mesh)
    state.params_D = replicate(state.params_D, mesh)
    state.params_G_ema = replicate(state.params_G_ema, mesh)
    state.opt_state_G = replicate(state.opt_state_G, mesh)
    state.opt_state_D = replicate(state.opt_state_D, mesh)

    sched, nrr = loss.schedules(cur_nimg=0)
    assert sched['blur_sigma'] == 2.0  # fade active at step 0
    new_state, stats = step.run_phases(
        state, batch, real, jax.random.PRNGKey(1), sched, nrr,
        do_greg=True, do_dreg=True)

    for k in ('Loss/G/loss', 'Loss/D/loss', 'Loss/G/reg', 'Loss/r1_penalty'):
        assert k in stats, k
        assert np.isfinite(float(stats[k])), (k, stats[k])

    # params actually moved, EMA between old and new
    old_w = np.asarray(state.params_G['texture_backbone']['synthesis']
                       ['b4']['conv1']['weight'])
    new_w = np.asarray(new_state.params_G['texture_backbone']['synthesis']
                       ['b4']['conv1']['weight'])
    assert np.abs(new_w - old_w).max() > 0
    # non-trainables untouched by the optimizer
    assert float(new_state.params_G['orth_scale'][0, 0]) == 5.0
    # w_avg EMA updated (reference updates it in Gmain and Dmain)
    assert np.abs(np.asarray(new_state.params_G['backbone']['mapping']['w_avg'])
                  ).max() > 0

    # second step with schedules advanced (same nrr -> no recompile)
    sched2, nrr2 = loss.schedules(cur_nimg=500)
    assert sched2['blur_sigma'] == 1.0 and nrr2 == nrr
    state3, stats3 = step.run_phases(
        new_state, batch, real, jax.random.PRNGKey(2), sched2, nrr2,
        do_greg=False, do_dreg=False)
    assert np.isfinite(float(stats3['Loss/G/loss']))


def test_trainable_mask_excludes_buffers(setup):
    G, D, loss, step, state = setup
    mask = trainable_mask(state.params_G)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    names = {(p[-1].key if hasattr(p[-1], 'key') else str(p[-1])): m
             for p, m in flat}
    assert names['w_avg'] is False
    assert names['orth_scale'] is False
    assert names['noise_const'] is False
    assert names['weight'] is True


def test_r1_gradient_is_second_order(setup, rng):
    """R1 loss must have nonzero gradient w.r.t. D params (double backward)."""
    G, D, loss, step, state = setup
    batch, real = _batch(rng, n=4)
    batch = {k: jnp.asarray(x) for k, x in batch.items()}
    sched, nrr = loss.schedules(0)
    real_p = loss.prepare_real(jnp.asarray(real), sched['blur_sigma'], nrr)

    def f(pd):
        l, _ = loss.dreg_loss(pd, batch, real_p, jax.random.PRNGKey(0), sched)
        return l
    g = jax.grad(f)(state.params_D)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
