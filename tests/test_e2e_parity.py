"""Flagship END-TO-END synthesis parity vs the reference (VERDICT r1
missing #3): the reference `TriPlaneGenerator.synthesis`
(training_avatar_texture/triplane_next3d.py:117-188) runs on torch-CPU
with its `Pytorch3dRasterizer` bridged to OUR JAX rasterizer (pytorch3d is
absent in this environment, and both stacks must agree on rasterization to
compare the composition downstream of it); weights are transferred through
the state-dict importer and the full composed pipeline — ws split, texture
backbone, 4-view rasterize, eye mask, fill_mouth, mouth crop/StyleUNet/
paste, neural blending, static-plane alpha mix, two-pass volume render,
superresolution — is pixel-compared at 128^2.
"""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import import_reference, torch_state_dict_numpy

DEMO = "/root/reference/data/demo/demo.obj"

RENDER_KW = dict(
    ray_start=2.25, ray_end=3.3, box_warp=1.0,
    depth_resolution=12, depth_resolution_importance=12,
    disparity_space_sampling=False, clamp_mode='softplus',
    c_gen_conditioning_zero=True, c_scale=1.0,
    superresolution_module=(
        'training_avatar_texture.superresolution.SuperresolutionHybrid2X'),
    superresolution_noise_mode='none', sr_antialias=True)
SMALL = dict(channel_base=2048, channel_max=64)


def _make_raster_bridge():
    """torch-facing shim with `Pytorch3dRasterizer.forward`'s contract
    (reference renderer.py:401-440), computed by our JAX rasterizer — the
    same op our model's rasterize() uses, so rasterization is common-mode
    and the comparison isolates everything composed around it."""
    import torch

    class _RasterBridge(torch.nn.Module):
        def forward(self, vertices, faces, attributes=None, h=None, w=None):
            from next3d_tpu.render.rasterizer import rasterize_with_attributes
            out = rasterize_with_attributes(
                jnp.asarray(vertices.detach().numpy()),
                jnp.asarray(faces[0].detach().numpy().astype(np.int32)),
                jnp.asarray(attributes.detach().numpy()),
                256, impl='tiled')
            return torch.as_tensor(np.asarray(out))

    return _RasterBridge()


def _fake_pt3d_load_obj(path):
    """pytorch3d.io.load_obj replacement built on our native obj parser."""
    import torch

    from next3d_tpu.utils.obj_io import load_obj
    mesh = load_obj(path)
    faces = types.SimpleNamespace(
        verts_idx=torch.as_tensor(mesh.faces.astype(np.int64)),
        textures_idx=torch.as_tensor(mesh.faces_uvs.astype(np.int64)))
    aux = types.SimpleNamespace(
        verts_uvs=torch.as_tensor(mesh.verts_uvs.astype(np.float32)))
    return torch.as_tensor(mesh.verts.astype(np.float32)), faces, aux


def test_flagship_synthesis_matches_reference(rng):
    if not os.path.exists(DEMO):
        pytest.skip("demo assets absent")
    import_reference()
    import torch

    from training_avatar_texture import triplane_next3d as ref_mod

    # constructor-time environment bridges: obj loader + eye-mask asset
    # (data/ffhq/uv_face_eye_mask.png is not in the checkout; both sides
    # use an all-ones mask)
    orig_load_obj = ref_mod.load_obj
    orig_imread = ref_mod.cv2.imread
    orig_rand_like = torch.rand_like
    orig_rand = torch.rand
    try:
        ref_mod.load_obj = _fake_pt3d_load_obj
        ref_mod.cv2.imread = \
            lambda p: np.full((256, 256, 3), 255, np.float32)
        torch.manual_seed(0)
        G_ref = ref_mod.TriPlaneGenerator(
            z_dim=64, c_dim=25, w_dim=512, img_resolution=128,
            img_channels=3, topology_path=DEMO, sr_num_fp16_res=0,
            rendering_kwargs=dict(RENDER_KW), **SMALL)
        G_ref.eval()
        G_ref.rasterizer = _make_raster_bridge()

        from next3d_tpu.models import TriPlaneGenerator
        from next3d_tpu.utils.obj_io import load_lms, load_obj
        from next3d_tpu.utils.pkl_import import state_dict_to_params
        G = TriPlaneGenerator(
            z_dim=64, c_dim=25, w_dim=512, img_resolution=128,
            img_channels=3, topology_path=DEMO, sr_num_fp16_res=0,
            rendering_kwargs=dict(RENDER_KW), plane_resolution=256,
            rasterizer_impl='tiled', force_fp32=True, **SMALL)
        # orth_scale/orth_shift are plain tensors in the reference (not in
        # state_dict); merge imported weights over init defaults
        from next3d_tpu.train.warm_start import copy_matching_params
        params = copy_matching_params(
            G.init(jax.random.PRNGKey(0)),
            state_dict_to_params(torch_state_dict_numpy(G_ref)))

        mesh = load_obj(DEMO)
        lms = load_lms("/root/reference/data/demo/demo_kpt2d.txt")
        v = np.concatenate([mesh.verts, lms], 0)[None].astype(np.float32)
        from next3d_tpu.cli.common import camera_label
        c = camera_label(0.2, -0.1).astype(np.float32)
        n_ws = G.backbone.num_ws_total if hasattr(G.backbone, 'num_ws_total') \
            else G.texture_backbone.num_ws * 2
        ws = rng.randn(1, n_ws, 512).astype(np.float32)

        # deterministic jitter on the reference (same draws as our
        # rng=None midpoint/linspace path — see test_render.py)
        def fake_rand_like(t, **kw):
            return torch.full_like(t, 0.5)

        def fake_rand(*shape, **kw):
            if len(shape) == 2:
                n, m = shape
                return torch.linspace(0, 1, m).expand(n, m).contiguous()
            return orig_rand(*shape, **kw)

        torch.rand_like = fake_rand_like
        torch.rand = fake_rand
        # nrr=32 (not 64): at nrr == SR input_resolution the reference's
        # SuperresolutionHybrid2X passes the feature_image[:, :3] VIEW
        # straight into SynthesisBlockNoUp, whose in-place ToRGB
        # accumulation (networks_stylegan2.py:584 `img.add_(y)`) mutates
        # the already-returned 'image_raw' — a latent aliasing bug of the
        # reference (unreachable in its shipped 512 config, where the
        # interpolate to 128 copies first). nrr=32 forces the copy on both
        # sides so the comparison sees the clean raw image.
        with torch.no_grad():
            want = G_ref.synthesis(torch.as_tensor(ws), torch.as_tensor(c),
                                   torch.as_tensor(v),
                                   neural_rendering_resolution=32,
                                   noise_mode='const', force_fp32=True)
    finally:
        ref_mod.load_obj = orig_load_obj
        ref_mod.cv2.imread = orig_imread
        torch.rand_like = orig_rand_like
        torch.rand = orig_rand

    got = G.synthesis(params, jnp.asarray(ws), jnp.asarray(c),
                      jnp.asarray(v), neural_rendering_resolution=32,
                      noise_mode='const', rng=None)

    # untrained N(0,1) weights give activations with ~3-unit dynamic range
    # through 15 composed modules; observed max-abs ~0.02 on 'image' with
    # q999 < 0.01 (fp ordering differences amplified by random weights)
    for key, max_tol, mean_tol in (('image', 3e-2, 2e-3),
                                   ('image_raw', 3e-2, 2e-3),
                                   ('image_depth', 8e-2, 5e-3)):
        w = want[key].numpy()
        g = np.asarray(got[key])
        assert g.shape == w.shape, (key, g.shape, w.shape)
        d = np.abs(g - w)
        assert d.max() <= max_tol, f'{key}: max abs err {d.max()}'
        assert d.mean() <= mean_tol, f'{key}: mean abs err {d.mean()}'
