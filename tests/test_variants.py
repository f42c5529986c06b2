"""Tests for the secondary model/discriminator variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.models import EG3DTriPlaneGenerator, TriPlaneTextureGenerator
from next3d_tpu.nn import DualLabelDualDiscriminator, DummyDualDiscriminator
from next3d_tpu.utils.pkl_import import state_dict_to_params

from ref_oracle import import_reference, torch_state_dict_numpy

DEMO = "/root/reference/data/demo/demo.obj"
SMALL = dict(channel_base=2048, channel_max=128)
RK = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=8,
          depth_resolution_importance=8, disparity_space_sampling=False,
          clamp_mode='softplus', c_gen_conditioning_zero=True, c_scale=1.0,
          superresolution_module='SuperresolutionHybrid2X',
          superresolution_noise_mode='none', sr_antialias=True)


def _camera(n=1):
    import math
    from next3d_tpu.render import camera_utils
    cam = camera_utils.lookat_pose(math.pi / 2, math.pi / 2,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7)
    K = camera_utils.fov_to_intrinsics(18.837)
    c = np.concatenate([np.asarray(cam).reshape(1, 16), K.reshape(1, 9)], 1)
    return np.repeat(c.astype(np.float32), n, 0)


def test_dual_label_discriminator_matches_reference(rng):
    import_reference()
    import torch
    from training_avatar_texture import dual_discriminator as ref

    torch.manual_seed(7)
    rd = ref.DualLabelDualDiscriminator(c_dim=25, c2_dim=50,
                                        img_resolution=64, img_channels=3,
                                        **SMALL)
    d = DualLabelDualDiscriminator(c_dim=25, c2_dim=50, img_resolution=64,
                                   img_channels=3, **SMALL)
    params = state_dict_to_params(torch_state_dict_numpy(rd))
    img = rng.randn(3, 3, 64, 64).astype(np.float32)
    raw = rng.randn(3, 3, 16, 16).astype(np.float32)
    c = rng.randn(3, 75).astype(np.float32)
    want = rd({'image': torch.as_tensor(img), 'image_raw': torch.as_tensor(raw)},
              torch.as_tensor(c), force_fp32=True).detach().numpy()
    got = np.asarray(d(params, {'image': jnp.asarray(img),
                                'image_raw': jnp.asarray(raw)},
                       jnp.asarray(c), force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_dummy_dual_discriminator_fades(rng):
    d = DummyDualDiscriminator(c_dim=25, img_resolution=32, img_channels=3,
                               **SMALL)
    params = d.init(jax.random.PRNGKey(0))
    img = {'image': jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32)),
           'image_raw': jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))}
    c = jnp.asarray(rng.randn(2, 25).astype(np.float32))
    out0 = np.asarray(d(params, img, c, cur_nimg=0))
    out_late = np.asarray(d(params, img, c, cur_nimg=10 ** 9))
    assert out0.shape == (2, 1)
    assert np.abs(out0 - out_late).max() > 0  # raw branch faded out


def test_texture_variant_runs(rng):
    from next3d_tpu.utils.obj_io import load_obj
    G = TriPlaneTextureGenerator(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology_path=DEMO, rendering_kwargs=RK, plane_resolution=64,
        rasterizer_patch=12, rasterizer_face_chunk=9976, **SMALL)
    params = G.init(jax.random.PRNGKey(0))
    assert 'mouth_backbone' not in params and 'neural_blending' not in params
    mesh = load_obj(DEMO)
    v = jnp.asarray(mesh.verts[None])  # no landmarks in this variant
    z = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    c = jnp.asarray(_camera(1))
    out = G(params, z, c, v, noise_mode='const')
    assert out['image'].shape == (1, 3, 128, 128)
    assert np.isfinite(np.asarray(out['image'])).all()


def test_eg3d_variant_runs(rng):
    G = EG3DTriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(RK, c_gen_conditioning_zero=False, c_scale=1.0),
        **SMALL)
    params = G.init(jax.random.PRNGKey(0))
    z = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    c = jnp.asarray(_camera(2))
    out = G(params, z, c, noise_mode='const')
    assert out['image'].shape == (2, 3, 128, 128)
    assert np.isfinite(np.asarray(out['image'])).all()
