"""Render-stack parity tests vs the reference volumetric_rendering code on
torch-CPU (pytorch3d stubbed; the rasterizer has its own golden tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.render import (
    ImportanceRenderer,
    generate_planes,
    mip_ray_marcher2,
    sample_from_planes,
)
from next3d_tpu.render.math_utils import get_ray_limits_box
from next3d_tpu.render.mesh import angle2matrix, batch_orth_proj, face_vertices
from next3d_tpu.render.ray_sampler import sample_rays
from next3d_tpu.render.renderer import sample_pdf, sample_stratified, unify_samples
from next3d_tpu.render import camera_utils

from ref_oracle import import_reference

OPTS = {
    'ray_start': 2.25, 'ray_end': 3.3, 'box_warp': 1.0,
    'depth_resolution': 12, 'depth_resolution_importance': 12,
    'disparity_space_sampling': False, 'clamp_mode': 'softplus',
    'white_back': False, 'density_noise': 0,
}


def _ref_modules():
    import_reference()
    from training_avatar_texture.volumetric_rendering import renderer as rref
    from training_avatar_texture.volumetric_rendering import ray_sampler as rs
    from training_avatar_texture.volumetric_rendering import math_utils as mu
    return rref, rs, mu


def test_ray_sampler_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    c2w = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    c2w[:, :3, 3] = rng.randn(2, 3).astype(np.float32)
    c2w[0, :3, :3] = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    K = np.tile(np.array([[4.26, 0.0, 0.5], [0, 4.26, 0.5], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    K[1, 0, 1] = 0.1  # exercise the skew path
    ro_t, rd_t = rs.RaySampler()(torch.as_tensor(c2w), torch.as_tensor(K), 8)
    ro, rd = sample_rays(jnp.asarray(c2w), jnp.asarray(K), 8)
    np.testing.assert_allclose(np.asarray(ro), ro_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_t.numpy(), rtol=1e-4, atol=1e-5)


def test_ray_limits_box_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    ro = rng.randn(2, 16, 3).astype(np.float32) * 2
    rd = rng.randn(2, 16, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    tmin_t, tmax_t = mu.get_ray_limits_box(torch.as_tensor(ro),
                                           torch.as_tensor(rd), 1.0)
    tmin, tmax = get_ray_limits_box(jnp.asarray(ro), jnp.asarray(rd), 1.0)
    np.testing.assert_allclose(np.asarray(tmin), tmin_t.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax), tmax_t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_ray_marcher_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    from training_avatar_texture.volumetric_rendering.ray_marcher import MipRayMarcher2
    colors = rng.rand(2, 8, 10, 5).astype(np.float32)
    densities = rng.randn(2, 8, 10, 1).astype(np.float32)
    depths = np.sort(rng.rand(2, 8, 10, 1).astype(np.float32) + 2.0, axis=2)
    rgb_t, d_t, w_t = MipRayMarcher2()(torch.as_tensor(colors),
                                       torch.as_tensor(densities),
                                       torch.as_tensor(depths), OPTS)
    rgb, d, w = mip_ray_marcher2(jnp.asarray(colors), jnp.asarray(densities),
                                 jnp.asarray(depths), OPTS)
    np.testing.assert_allclose(np.asarray(rgb), rgb_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), d_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_t.numpy(), rtol=1e-4, atol=1e-5)


def test_sample_from_planes_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    planes = rng.randn(2, 3, 4, 8, 8).astype(np.float32)
    coords = (rng.rand(2, 33, 3).astype(np.float32) - 0.5) * 1.4
    axes = torch.as_tensor(generate_planes())
    want = rref.sample_from_planes(axes, torch.as_tensor(planes),
                                   torch.as_tensor(coords), box_warp=1.0).numpy()
    got = np.asarray(sample_from_planes(jnp.asarray(planes), jnp.asarray(coords),
                                        box_warp=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_det_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    r = rref.ImportanceRenderer()
    bins = np.sort(rng.rand(6, 11).astype(np.float32), axis=1)
    weights = rng.rand(6, 10).astype(np.float32)
    want = r.sample_pdf(torch.as_tensor(bins), torch.as_tensor(weights),
                        8, det=True).numpy()
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                8, det=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unify_samples_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    d1 = rng.rand(2, 4, 6, 1).astype(np.float32)
    c1 = rng.rand(2, 4, 6, 5).astype(np.float32)
    s1 = rng.rand(2, 4, 6, 1).astype(np.float32)
    d2 = rng.rand(2, 4, 3, 1).astype(np.float32)
    c2 = rng.rand(2, 4, 3, 5).astype(np.float32)
    s2 = rng.rand(2, 4, 3, 1).astype(np.float32)
    r = rref.ImportanceRenderer()
    wd, wc, ws = r.unify_samples(*[torch.as_tensor(a) for a in
                                   (d1, c1, s1, d2, c2, s2)])
    gd, gc, gs = unify_samples(*[jnp.asarray(a) for a in (d1, c1, s1, d2, c2, s2)])
    np.testing.assert_allclose(np.asarray(gd), wd.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), wc.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), ws.numpy(), atol=1e-6)


class _TorchLinearDecoder:
    """Deterministic toy decoder usable from both frameworks."""

    def __init__(self, rng, c_in=4, c_out=5):
        self.W = rng.randn(c_in, c_out + 1).astype(np.float32) * 0.3

    def torch_fn(self):
        import torch
        W = torch.as_tensor(self.W)

        class D(torch.nn.Module):
            def forward(self, feats, dirs):
                x = feats.mean(1) @ W
                return {'rgb': torch.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001,
                        'sigma': x[..., 0:1]}
        return D()

    def jax_fn(self):
        W = jnp.asarray(self.W)

        def fn(params, feats, dirs):
            x = jnp.mean(feats, axis=1) @ W
            return {'rgb': jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001,
                    'sigma': x[..., 0:1]}
        return (None, fn)


@pytest.mark.parametrize("auto_box", [False, True])
def test_importance_renderer_deterministic_matches(rng, auto_box):
    """Full two-pass renderer vs reference with deterministic jitter
    (torch.rand* monkeypatched to the same midpoint/linspace draws)."""
    rref, rs, mu = _ref_modules()
    import torch

    opts = dict(OPTS)
    if auto_box:
        opts['ray_start'] = opts['ray_end'] = 'auto'
        opts['box_warp'] = 1.0

    dec = _TorchLinearDecoder(rng)
    planes = (rng.randn(2, 3, 4, 8, 8).astype(np.float32))

    # camera slightly outside the box looking at origin
    c2w = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    c2w[:, 2, 3] = -2.7  # put camera on -z... (rays go toward +z)
    K = np.tile(np.array([[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    ro, rd = sample_rays(jnp.asarray(c2w), jnp.asarray(K), 4)
    ro_n, rd_n = np.asarray(ro), np.asarray(rd)

    # --- reference with deterministic randomness
    orig_rand_like = torch.rand_like
    orig_rand = torch.rand

    def fake_rand_like(t, **kw):
        return torch.full_like(t, 0.5)

    def fake_rand(*shape, **kw):
        if len(shape) == 2:  # sample_pdf's u
            n, m = shape
            return torch.linspace(0, 1, m).expand(n, m).contiguous()
        return orig_rand(*shape, **kw)

    torch.rand_like = fake_rand_like
    torch.rand = fake_rand
    try:
        r = rref.ImportanceRenderer()
        rgb_t, d_t, w_t = r(torch.as_tensor(planes), dec.torch_fn(),
                            torch.as_tensor(ro_n), torch.as_tensor(rd_n), opts)
    finally:
        torch.rand_like = orig_rand_like
        torch.rand = orig_rand

    # --- ours with rng=None (same deterministic draws)
    renderer = ImportanceRenderer()
    rgb, d, w = renderer(None, jnp.asarray(planes), dec.jax_fn(),
                         jnp.asarray(ro_n), jnp.asarray(rd_n), opts)
    np.testing.assert_allclose(np.asarray(rgb), rgb_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), d_t.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(w), w_t.numpy(), rtol=1e-3, atol=1e-4)


def test_mesh_math_matches(rng):
    rref, rs, mu = _ref_modules()
    import torch
    # angle2matrix
    for ang in ([0, 0, 0], [0, 90, 0], [0, -90, 0], [90, 0, 0], [10, 20, 30]):
        want = rref.angle2matrix(torch.tensor(ang, dtype=torch.float32)
                                 .reshape(1, -1)).numpy()
        got = np.asarray(angle2matrix(jnp.asarray([ang], jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # batch_orth_proj
    X = rng.randn(2, 7, 3).astype(np.float32)
    cam = np.array([1., 0., 0.], np.float32)
    want = rref.batch_orth_proj(torch.as_tensor(X), torch.as_tensor(cam)).numpy()
    got = np.asarray(batch_orth_proj(jnp.asarray(X), jnp.asarray(cam)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # face_vertices
    verts = rng.randn(2, 9, 3).astype(np.float32)
    faces = rng.randint(0, 9, (2, 5, 3))
    want = rref.face_vertices(torch.as_tensor(verts),
                              torch.as_tensor(faces)).numpy()
    got = np.asarray(face_vertices(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_camera_utils_match(rng):
    import_reference()
    import torch
    import camera_utils as ref_cam
    import math
    want = ref_cam.LookAtPoseSampler.sample(
        math.pi / 2 + 0.3, math.pi / 2 - 0.1,
        torch.tensor([0, 0, 0.2]), radius=2.7, batch_size=1).numpy()
    got = np.asarray(camera_utils.lookat_pose(
        math.pi / 2 + 0.3, math.pi / 2 - 0.1, jnp.asarray([0, 0, 0.2]),
        radius=2.7, batch_size=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(camera_utils.fov_to_intrinsics(18.837)),
        ref_cam.FOV_to_intrinsics(18.837).numpy(), rtol=1e-6)
