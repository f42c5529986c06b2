"""Vanilla EG3D tri-plane generator (no mesh/texture conditioning).

Behavioral spec: training/triplane.py (reference) — a single StyleGAN2
backbone whose 96-channel output is reshaped to 3 x 32 planes (:70-75),
volume-rendered and super-resolved. Kept for EG3D checkpoint warm-starts
(ffhqrebalanced512-64.pkl) and as the static-plane-only ablation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.stylegan2 import Generator as StyleGAN2Backbone
from ..render.ray_sampler import sample_rays
from ..render.renderer import ImportanceRenderer
from ..utils.registry import register
from .osg_decoder import OSGDecoder


class EG3DTriPlaneGenerator:
    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 sr_num_fp16_res=0, mapping_kwargs=None, rendering_kwargs=None,
                 sr_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.rendering_kwargs = dict(rendering_kwargs or {})
        self.neural_rendering_resolution = 64

        self.renderer = ImportanceRenderer()
        self.backbone = StyleGAN2Backbone(
            z_dim, c_dim, w_dim, img_resolution=256, img_channels=32 * 3,
            mapping_kwargs=mapping_kwargs or {}, **synthesis_kwargs)
        sr_name = self.rendering_kwargs.get(
            'superresolution_module', 'SuperresolutionHybrid8XDC').rsplit('.', 1)[-1]
        from .. import nn as nn_mod
        self.superresolution = getattr(nn_mod, sr_name)(
            channels=32, img_resolution=img_resolution,
            sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=self.rendering_kwargs.get('sr_antialias', True),
            **(sr_kwargs or {}))
        self.decoder = OSGDecoder(
            32, {'decoder_lr_mul': self.rendering_kwargs.get('decoder_lr_mul', 1),
                 'decoder_output_dim': 32})

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        return {'backbone': self.backbone.init(k0),
                'superresolution': self.superresolution.init(k1),
                'decoder': self.decoder.init(k2)}

    def mapping(self, params, z, c, truncation_psi=1, truncation_cutoff=None,
                return_w_mean=False):
        if self.rendering_kwargs.get('c_gen_conditioning_zero', False):
            c = jnp.zeros_like(c)
        return self.backbone.mapping(
            params['backbone']['mapping'], z,
            c * self.rendering_kwargs.get('c_scale', 0),
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
            return_w_mean=return_w_mean)

    def build_planes(self, params, ws, noise_mode='random', rng=None,
                     **synthesis_kwargs):
        planes = self.backbone.synthesis(
            params['backbone']['synthesis'], ws, noise_mode=noise_mode,
            rng=rng, **synthesis_kwargs)
        N = planes.shape[0]
        return planes.reshape(N, 3, 32, *planes.shape[-2:])

    def synthesis(self, params, ws, c, neural_rendering_resolution=None,
                  noise_mode='random', rng=None, **synthesis_kwargs):
        cam2world = c[:, :16].reshape(-1, 4, 4)
        intrinsics = c[:, 16:25].reshape(-1, 3, 3)
        nrr = neural_rendering_resolution or self.neural_rendering_resolution
        ray_origins, ray_directions = sample_rays(cam2world, intrinsics, nrr)
        N = ray_origins.shape[0]

        planes = self.build_planes(params, ws, noise_mode=noise_mode,
                                   rng=None if rng is None else jax.random.fold_in(rng, 0),
                                   **synthesis_kwargs)
        feature_samples, depth_samples, _ = self.renderer(
            None if rng is None else jax.random.fold_in(rng, 1), planes,
            (params['decoder'], self.decoder), ray_origins, ray_directions,
            self.rendering_kwargs)
        H = W = nrr
        feature_image = feature_samples.transpose(0, 2, 1).reshape(
            N, feature_samples.shape[-1], H, W)
        depth_image = depth_samples.transpose(0, 2, 1).reshape(N, 1, H, W)
        rgb_image = feature_image[:, :3]
        sr_image = self.superresolution(
            params['superresolution'], rgb_image, feature_image, ws,
            noise_mode=self.rendering_kwargs.get('superresolution_noise_mode',
                                                 noise_mode),
            rng=None if rng is None else jax.random.fold_in(rng, 2))
        return {'image': sr_image, 'image_raw': rgb_image,
                'image_depth': depth_image}

    def sample_mixed(self, params, coordinates, directions, ws,
                     noise_mode='random', rng=None, **synthesis_kwargs):
        planes = self.build_planes(params, ws, noise_mode=noise_mode, rng=rng,
                                   **synthesis_kwargs)
        return self.renderer.run_model(
            planes, (params['decoder'], self.decoder), coordinates, directions,
            self.rendering_kwargs)

    def __call__(self, params, z, c, truncation_psi=1, truncation_cutoff=None,
                 **kwargs):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params, ws, c, **kwargs)


@register('EG3DTriPlaneGenerator')
@register('eg3d')
def build_eg3d_generator(**kwargs):
    return EG3DTriPlaneGenerator(**kwargs)
