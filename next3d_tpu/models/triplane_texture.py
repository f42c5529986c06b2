"""Simpler avatar variant: texture + static backbones, no mouth/landmarks.

Behavioral spec: training_avatar_texture/triplane.py (the default when
--model_version is unset, train_next3d.py:295): rasterize_orth projects the
textured FLAME mesh into 4 fixed views with a z-180 roll (:154-180), the
side views are summed, and — per the reference's in-code 'debug' block —
only the FRONT view's dynamic texture is actually blended (side/top alphas
zeroed, :176-178). No mouth StyleUNet, no neural blending, no landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample_2d
from ..render.mesh import angle2matrix, batch_orth_proj
from ..render.rasterizer import rasterize_with_attributes
from .triplane_next3d import TriPlaneGenerator, _fold
from ..utils.registry import register

ORTH_VIEWS = ((0, 0, 180), (90, 0, 180), (0, 90, 180), (0, -90, 180))


class TriPlaneTextureGenerator(TriPlaneGenerator):
    """Inherits construction/rendering from the flagship; replaces the plane
    build with the no-mouth rasterize_orth pipeline."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.load_lms = False
        self.view_tforms_orth = np.stack([
            np.asarray(angle2matrix(jnp.asarray([v], jnp.float32)))[0]
            for v in ORTH_VIEWS])

    def init(self, key):
        params = super().init(key)
        # no mouth/blending networks in this variant
        params.pop('mouth_backbone')
        params.pop('neural_blending')
        return params

    def rasterize_orth(self, params, v, textures):
        """reference triplane.py:154-180 (no y-flip, z-180 views, no
        fill_mouth)."""
        N = v.shape[0]
        V = len(ORTH_VIEWS)
        tforms = jnp.asarray(self.view_tforms_orth)
        tv = jnp.einsum('vnpc,vcd->vnpd',
                        jnp.broadcast_to(v[None], (V,) + v.shape), tforms,
                        precision=jax.lax.Precision.HIGHEST)
        tv = (tv + params['orth_shift']) * params['orth_scale']
        tv = tv.reshape(V * N, self.num_verts, 3)
        tv = batch_orth_proj(tv, jnp.asarray([1., 0., 0.]))
        tv = tv.at[:, :, 1:].multiply(-1)
        tv = tv.at[:, :, 2].add(10.0)

        attrs = jnp.broadcast_to(jnp.asarray(self.face_uvcoords)[None],
                                 (V * N,) + self.face_uvcoords.shape)
        rendering = rasterize_with_attributes(
            tv, jnp.asarray(self.faces), attrs, self.uv_resolution,
            patch=self.rasterizer_patch, face_chunk=self.rasterizer_face_chunk,
            impl=self.rasterizer_impl,
            tile_capacity=self.rasterizer_tile_capacity)
        alpha = jax.lax.stop_gradient(rendering[:, -1:])
        grid = jax.lax.stop_gradient(
            rendering[:, :-1].transpose(0, 2, 3, 1)[..., :2])
        eye_mask = jnp.broadcast_to(
            jnp.asarray(self.uv_face_mask)[None, None],
            (V * N, 1) + self.uv_face_mask.shape)
        alpha = grid_sample_2d(eye_mask, grid) * alpha
        # NOTE: texture grid is NOT detached here (reference triplane.py:168)
        tex = jnp.broadcast_to(textures[None], (V,) + textures.shape)
        tex = tex.reshape((V * N,) + textures.shape[1:])
        rendering_image = grid_sample_2d(tex, rendering[:, :-1]
                                         .transpose(0, 2, 3, 1)[..., :2])

        rendering_image = rendering_image.reshape((V, N) + rendering_image.shape[1:])
        alpha = alpha.reshape((V, N) + alpha.shape[1:])
        rendering_side = rendering_image[2] + rendering_image[3]
        renderings = jnp.concatenate([rendering_image[0], rendering_image[1],
                                      rendering_side], axis=1)
        # 'debug' block: only the front view's dynamic texture is used
        # (reference :176-178)
        alphas = jnp.concatenate([alpha[0], jnp.zeros_like(alpha[1]),
                                  jnp.zeros_like(alpha[1])], axis=1)
        return renderings, alphas

    def build_planes(self, params, ws, v, noise_mode='random', rng=None,
                     **synthesis_kwargs):
        n_tex = self.texture_backbone.num_ws
        eg3d_ws, texture_ws = ws[:, :n_tex], ws[:, n_tex:]
        planes = self.backbone.synthesis(
            params['backbone']['synthesis'], eg3d_ws, noise_mode=noise_mode,
            rng=_fold(rng, 3), force_fp32=self.force_fp32, **synthesis_kwargs)
        textures = self.texture_backbone.synthesis(
            params['texture_backbone']['synthesis'], texture_ws,
            noise_mode=noise_mode, rng=_fold(rng, 0),
            force_fp32=self.force_fp32, **synthesis_kwargs)
        renderings, alphas = self.rasterize_orth(params, v, textures)
        N = planes.shape[0]
        planes = planes.reshape(N, 3, 32, *planes.shape[-2:])
        renderings = renderings.reshape(planes.shape)
        alphas = alphas[:, :, None]  # (N, 3, 1, H, W)
        return renderings * alphas + planes * (1 - alphas), eg3d_ws


@register('TriPlaneTextureGenerator')
@register('avatar_texture')
def build_texture_generator(**kwargs):
    return TriPlaneTextureGenerator(**kwargs)
