"""The flagship Next3D generator: generative texture-rasterized tri-planes.

Behavioral spec: training_avatar_texture/triplane_next3d.py (construction
:41-109, mapping :111-115, synthesis :117-188, rasterize :190-230,
sample/sample_mixed :232-323, gen_mouth_mask :330-344).

TPU-first restructuring (behavior preserved):
  * the 4 orthographic rasterization views are folded into the batch axis and
    rasterized in ONE call to the TPU rasterizer (the reference loops views
    and round-trips to OpenCV per view);
  * fill_mouth runs on-device (render/fill_mouth.py);
  * the mouth crop/paste is static-shape dynamic-window resampling
    (ops/interpolate.py) instead of per-sample python slicing;
  * plane construction is factored out (``build_planes``) so shape extraction
    does NOT rebuild textures per chunk (fixes the reference inefficiency at
    triplane_next3d.py:232-276 noted in SURVEY.md Appendix A).

Parameter tree uses reference names: texture_backbone, mouth_backbone,
backbone, superresolution, decoder, neural_blending, orth_scale, orth_shift.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.styleunet import CondGenerator
from ..nn.stylegan2 import Generator as StyleGAN2Backbone
from ..ops import grid_sample_2d
from ..ops.shared_sample import bilinear_sample_shared
from ..ops.interpolate import (interpolate_nearest, paste_resized_region,
                               resample_region)
from ..render.fill_mouth import fill_mouth
from ..render.mesh import angle2matrix, batch_orth_proj, face_vertices
from ..render.rasterizer import rasterize_uv_with_alpha
from ..render.ray_sampler import sample_rays
from ..render.renderer import ImportanceRenderer
from ..utils.obj_io import ObjMesh, load_obj
from ..utils.registry import register, resolve
from .osg_decoder import OSGDecoder

RENDERING_VIEWS = ((0, 0, 0), (0, 90, 0), (0, -90, 0), (90, 0, 0))
N_FLAME_VERTS = 5023


def _load_eye_mask(path, size=256):
    if path is None:
        return np.ones((size, size), np.float32)
    from PIL import Image
    img = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    if img.ndim == 3:
        img = img[..., 0]
    m = jnp.asarray(img)[None, None]
    return np.asarray(interpolate_nearest(m, (size, size)))[0, 0]


class TriPlaneGenerator:
    """Flagship --model_version=next3d generator."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 topology_path, uv_face_eye_mask_path=None, sr_num_fp16_res=0,
                 mapping_kwargs=None, rendering_kwargs=None, sr_kwargs=None,
                 rasterizer_patch=32, rasterizer_face_chunk=2048,
                 rasterizer_impl='auto', rasterizer_tile_capacity=448,
                 plane_resolution=256, force_fp32=True, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.topology_path = topology_path
        self.rendering_kwargs = dict(rendering_kwargs or {})
        self.neural_rendering_resolution = 64
        # plane_resolution=256 matches the reference exactly
        # (triplane_next3d.py:63-65,75); smaller values give cheap test/
        # dry-run configs with the same structure
        self.plane_resolution = plane_resolution
        self.uv_resolution = plane_resolution
        self.rasterizer_patch = rasterizer_patch
        self.rasterizer_face_chunk = rasterizer_face_chunk
        self.rasterizer_impl = rasterizer_impl
        self.rasterizer_tile_capacity = rasterizer_tile_capacity
        # force_fp32=True pins every block to fp32 (parity mode; the
        # reference trains G in fp32, train_next3d.py:196-198). False lets
        # use_fp16 blocks run bfloat16 — the TPU fast path — and stores
        # the gathered tri-plane/texture tables in bf16 (halves the bytes
        # of the gather-bound hot path; features promoted back to f32
        # before the decoder).
        self.force_fp32 = force_fp32
        self.rendering_kwargs.setdefault('gather_bf16', not force_fp32)
        self.load_lms = True
        mapping_kwargs = mapping_kwargs or {}

        self.renderer = ImportanceRenderer()
        # reference: triplane_next3d.py:63-65,109
        R = plane_resolution
        self.texture_backbone = StyleGAN2Backbone(
            z_dim, c_dim, w_dim, img_resolution=R, img_channels=32,
            mapping_kwargs=mapping_kwargs, **synthesis_kwargs)
        self.mouth_backbone = CondGenerator(
            z_dim, c_dim, w_dim, img_resolution=R, img_channels=32,
            in_size=64, final_size=4, cond_channels=32, num_cond_res=64,
            mapping_kwargs=mapping_kwargs, **synthesis_kwargs)
        self.backbone = StyleGAN2Backbone(
            z_dim, c_dim, w_dim, img_resolution=R, img_channels=32 * 3,
            mapping_ws=self.texture_backbone.num_ws * 2,
            mapping_kwargs=mapping_kwargs, **synthesis_kwargs)
        self.neural_blending = CondGenerator(
            z_dim, c_dim, w_dim, cond_channels=32, img_resolution=R,
            img_channels=32, in_size=min(R, 256), final_size=32,
            num_cond_res=R, mapping_kwargs=mapping_kwargs,
            **synthesis_kwargs)
        sr_name = self.rendering_kwargs.get(
            'superresolution_module',
            'next3d_tpu.nn.superresolution.SuperresolutionHybrid8XDC')
        # accept the reference's dotted torch paths too
        sr_name = sr_name.rsplit('.', 1)[-1]
        from .. import nn as nn_mod
        self.superresolution = getattr(nn_mod, sr_name)(
            channels=32, img_resolution=img_resolution,
            sr_num_fp16_res=sr_num_fp16_res,
            sr_antialias=self.rendering_kwargs.get('sr_antialias', True),
            **(sr_kwargs or {}))
        # decoder_bf16 default follows force_fp32 (ADVICE r4): the deviation
        # from the reference's always-fp32 decoder is quality-validated at
        # full scale — bf16 pipeline image max-abs 0.0058 / 68 dB PSNR vs
        # the fp32 torch oracle (docs/full_scale_parity_report.json 'bf16'
        # rows; in-suite bound tests/test_bf16_parity.py). Opt out via
        # rendering_kwargs['decoder_bf16']=False.
        self.decoder = OSGDecoder(
            32, {'decoder_lr_mul': self.rendering_kwargs.get('decoder_lr_mul', 1),
                 'decoder_output_dim': 32,
                 'decoder_bf16': self.rendering_kwargs.get('decoder_bf16',
                                                           not force_fp32)})

        # --- static mesh buffers (reference :79-106)
        mesh = load_obj(topology_path) if isinstance(topology_path, str) \
            else topology_path
        assert mesh.verts_uvs is not None and mesh.faces_uvs is not None, \
            "topology obj must carry UVs"
        uvcoords = np.concatenate(
            [mesh.verts_uvs, np.ones_like(mesh.verts_uvs[:, :1])], axis=-1)
        uvcoords = uvcoords * 2 - 1
        uvcoords[:, 1] = -uvcoords[:, 1]
        face_uv = np.asarray(face_vertices(
            jnp.asarray(uvcoords[None]), jnp.asarray(mesh.faces_uvs[None])))[0]
        # pre-apply the per-call reorders (reference :207-208)
        self.faces = mesh.faces[:, [0, 2, 1]].astype(np.int32)          # (F, 3)
        self.face_uvcoords = face_uv[:, [0, 2, 1], :].astype(np.float32)  # (F, 3, 3)
        self.num_verts = mesh.verts.shape[0]
        self.uv_face_mask = _load_eye_mask(uv_face_eye_mask_path,
                                           self.uv_resolution)
        self.fill_mouth = True
        # constant per-view rotation matrices (reference :197)
        self.view_tforms = np.stack([
            np.asarray(angle2matrix(jnp.asarray([v], jnp.float32)))[0]
            for v in RENDERING_VIEWS])  # (4, 3, 3)
        self._validate_rasterizer_capacity(mesh.verts)

    def _validate_rasterizer_capacity(self, neutral_verts):
        """Build-time guard (VERDICT r1 weak #5): project the topology's
        NEUTRAL mesh through all rendering views at the init orth_scale and
        verify the configured rasterizer capacity covers it with margin —
        a mis-sized capacity then fails loudly at construction instead of
        silently dropping faces during training."""
        from ..render.rasterizer import (required_patch_size,
                                         required_tile_capacity)
        v = np.asarray(neutral_verts, np.float32) * np.asarray([1., -1., 1.])
        tv = v @ self.view_tforms.transpose(0, 2, 1)          # (V, N, 3)
        tv = (tv + np.asarray([0.0, -0.01, -0.01])) * 5.0
        # batch_orth_proj(aspect [1,0,0]) keeps xy as-is; y,z negate + z+10
        tv = tv * np.asarray([1., -1., -1.]) + np.asarray([0., 0., 10.])
        res = self.uv_resolution
        patch_need = required_patch_size(tv, self.faces, res)
        if self.rasterizer_impl == 'pallas_binned16':
            # TILE=16 kernel: exact for spans < 32 px (3x3 entry rectangle)
            # and per-tile occupancy within its smaller DMA window
            from ..ops.pallas_raster import MAX_SEG16
            seg_need = required_tile_capacity(tv, self.faces, res, tile=16)
            if seg_need * 1.25 + 128 > MAX_SEG16 or patch_need >= 32 * 0.8:
                raise ValueError(
                    f'pallas_binned16: tile=16 segments need {seg_need} '
                    f'entries (max_seg={MAX_SEG16}) / span {patch_need:.0f}px '
                    f'at {res}px; use pallas_binned or tiled')
        if self.rasterizer_impl in ('auto', 'pallas_binned'):
            # per-tile segment capacity of the binned kernel (ADVICE r2):
            # a face emits at most ONE entry per tile (its 4 bbox-corner
            # entries land in 4 distinct tiles), so the per-tile entry count
            # is bounded by faces-overlapping-tile = required_tile_capacity.
            # The kernel DMAs MAX_SEG entries per tile (minus <=127
            # alignment skip) and clamps reads beyond it, so overflow would
            # drop faces silently. 25% slack over the neutral mesh absorbs
            # expression deformation. 'auto' falls back to 'tiled' (its
            # non-TPU resolution anyway); explicit 'pallas_binned' fails
            # loudly at construction. Neutral FLAME @256: max 2120 entries.
            from ..ops.pallas_raster import MAX_SEG
            seg_need = required_tile_capacity(tv, self.faces, res, tile=32)
            over_seg = seg_need * 1.25 + 128 > MAX_SEG
            over_span = patch_need >= 32 * 0.8
            if over_seg or over_span:
                why = (f'tile segments need {seg_need} entries '
                       f'(max_seg={MAX_SEG})' if over_seg else
                       f'face bbox span {patch_need:.0f}px approaches the '
                       f'TILE=32 limit')
                if self.rasterizer_impl == 'auto':
                    self.rasterizer_impl = 'tiled'
                    # size the tiled fallback to the measured occupancy
                    # (top_k keeps the NEAREST faces, so need/4 suffices —
                    # see the tiled-path guard below)
                    need = required_tile_capacity(tv, self.faces, res, tile=8)
                    self.rasterizer_tile_capacity = max(
                        self.rasterizer_tile_capacity, -(-need // 4))
                else:
                    raise ValueError(
                        f'binned rasterizer: {why} at {res}px; use '
                        f"rasterizer_impl='tiled' or a lower "
                        f'plane_resolution')
        if self.rasterizer_impl in ('tiled',):
            need = required_tile_capacity(tv, self.faces, res, tile=8)
            # the tiled path keeps the `capacity` NEAREST faces; a 25% slack
            # over the neutral-mesh occupancy absorbs expression deformation
            if self.rasterizer_tile_capacity * 4 < need:
                raise ValueError(
                    f'rasterizer_tile_capacity={self.rasterizer_tile_capacity}'
                    f' too small: neutral mesh already stacks {need} faces'
                    f' per 8px tile at {res}px')
        if self.rasterizer_impl in ('scatter',) \
                and patch_need >= self.rasterizer_patch:
            raise ValueError(
                f'rasterizer_patch={self.rasterizer_patch} < required '
                f'{patch_need:.0f}px')

    # ------------------------------------------------------------------ init
    def init(self, key):
        keys = jax.random.split(key, 6)
        return {
            'texture_backbone': self.texture_backbone.init(keys[0]),
            'mouth_backbone': self.mouth_backbone.init(keys[1]),
            'backbone': self.backbone.init(keys[2]),
            'neural_blending': self.neural_blending.init(keys[3]),
            'superresolution': self.superresolution.init(keys[4]),
            'decoder': self.decoder.init(keys[5]),
            'orth_scale': jnp.asarray([[5.0]], jnp.float32),
            'orth_shift': jnp.asarray([[0.0, -0.01, -0.01]], jnp.float32),
        }

    # --------------------------------------------------------------- mapping
    def mapping(self, params, z, c, truncation_psi=1, truncation_cutoff=None,
                return_w_mean=False):
        """reference :111-115 — camera-only conditioning, optional zeroing."""
        if self.rendering_kwargs.get('c_gen_conditioning_zero', True):
            c = jnp.zeros_like(c)
        c = c[:, :25]
        c = c * self.rendering_kwargs.get('c_scale', 0)
        return self.backbone.mapping(params['backbone']['mapping'], z, c,
                                     truncation_psi=truncation_psi,
                                     truncation_cutoff=truncation_cutoff,
                                     return_w_mean=return_w_mean)

    # ------------------------------------------------------------- rasterize
    def rasterize(self, params, v, lms, textures, **_):
        """4 orthographic views folded into the batch axis (reference :190-230).

        Returns ([front, side, top] feature images, [alphas], lm2d_front).
        """
        N = v.shape[0]
        V = len(RENDERING_VIEWS)
        tforms = jnp.asarray(self.view_tforms)  # (V, 3, 3)
        orth_shift = params['orth_shift']
        orth_scale = params['orth_scale']

        flip = jnp.asarray([1., -1., 1.], v.dtype)
        v_flip = (v * flip)[None]      # (1, N, 5023, 3)
        lms_flip = (lms * flip)[None]

        tv = jnp.einsum('vnpc,vcd->vnpd',
                        jnp.broadcast_to(v_flip, (V,) + v_flip.shape[1:]),
                        tforms, precision=jax.lax.Precision.HIGHEST)
        tv = (tv + orth_shift) * orth_scale
        tv = tv.reshape(V * N, self.num_verts, 3)
        tv = batch_orth_proj(tv, jnp.asarray([1., 0., 0.]))
        tv = tv.at[:, :, 1:].multiply(-1)
        tv = tv.at[:, :, 2].add(10.0)

        tl = jnp.einsum('vnpc,vcd->vnpd',
                        jnp.broadcast_to(lms_flip, (V,) + lms_flip.shape[1:]),
                        tforms, precision=jax.lax.Precision.HIGHEST)
        tl = (tl + orth_shift) * orth_scale
        tl = tl.reshape(V * N, -1, 3)
        tl = batch_orth_proj(tl, jnp.asarray([1., 0., 0.]))[:, :, :2]
        tl = tl.at[:, :, 1:].multiply(-1)

        attrs = jnp.broadcast_to(
            jnp.asarray(self.face_uvcoords[..., :2])[None],
            (V * N,) + self.face_uvcoords.shape[:-1] + (2,))
        rendering = rasterize_uv_with_alpha(
            tv, jnp.asarray(self.faces), attrs, self.uv_resolution,
            patch=self.rasterizer_patch, face_chunk=self.rasterizer_face_chunk,
            impl=self.rasterizer_impl,
            tile_capacity=self.rasterizer_tile_capacity)
        # (V*N, 3, H, W): (u, v, alpha)
        alpha = jax.lax.stop_gradient(rendering[:, -1:])
        grid = jax.lax.stop_gradient(rendering.transpose(0, 2, 3, 1)[..., :2])

        # The 4 views FOLD INTO THE GRID, not the texture batch: the
        # texture is identical across views, so building the (V*N)-batch
        # packed gather table would 4x its construction and HBM footprint
        # for the same row count (round 4; the view-major grid rows
        # transpose to batch-major and back around the gather).
        tex = textures
        if not self.force_fp32 and tex.dtype == jnp.float32:
            tex = tex.astype(jnp.bfloat16)  # halve gather bytes (see init)
        res = self.uv_resolution
        grid_vn = grid.reshape(V, N, res, res, 2).transpose(1, 0, 2, 3, 4)
        grid_vn = grid_vn.reshape(N, V * res, res, 2)
        if os.environ.get('NEXT3D_TEXMASK_PATH', 'separable') == 'fused':
            # round-4 path: eye mask rides the texture gather as an extra
            # channel — but 33ch packs to 4*33=132 bf16 lanes = 264 B/row,
            # past the 256 B boundary, which doubles the per-row gather
            # cost (docs/STAGE_PROFILE.md round 5).
            eye_mask = jnp.broadcast_to(
                jnp.asarray(self.uv_face_mask)[None, None],
                (N, 1) + self.uv_face_mask.shape).astype(tex.dtype)
            sampled = grid_sample_2d(
                jnp.concatenate([tex, eye_mask], axis=1),
                grid_vn).astype(jnp.float32)
        else:
            # round 5: texture gathers at exactly 4*32=128 packed lanes
            # (256 B rows, the measured issue-rate sweet spot); the shared
            # 1-ch eye mask is sampled by a separable one-hot MXU
            # contraction instead of paying the per-row gather floor a
            # second time (ops/shared_sample.py).
            sampled_tex = grid_sample_2d(tex, grid_vn).astype(jnp.float32)
            mask = bilinear_sample_shared(
                jnp.asarray(self.uv_face_mask).astype(tex.dtype), grid_vn)
            sampled = jnp.concatenate(
                [sampled_tex, mask[:, None].astype(jnp.float32)], axis=1)
        sampled = sampled.reshape(sampled.shape[0], sampled.shape[1],
                                  V, res, res).transpose(2, 0, 1, 3, 4)
        sampled = sampled.reshape(V * N, -1, res, res)
        rendering_image = sampled[:, :-1]
        mask_face_eye = jax.lax.stop_gradient(sampled[:, -1:])
        alpha = mask_face_eye * alpha
        if self.fill_mouth:
            alpha = fill_mouth(alpha)

        rendering_image = rendering_image.reshape((V, N) + rendering_image.shape[1:])
        alpha = alpha.reshape((V, N) + alpha.shape[1:])
        tl = tl.reshape(V, N, -1, 2)

        # side views summed; alpha_side reproduces the reference's
        # left-view-only OR bug (triplane_next3d.py:226, SURVEY Appendix A)
        rendering_side = rendering_image[1] + rendering_image[2]
        alpha_side = ((alpha[1] > 0) | (alpha[1] > 0)).astype(alpha.dtype)
        images = [rendering_image[0], rendering_side, rendering_image[3]]
        alphas = [alpha[0], alpha_side, alpha[3]]
        return images, alphas, tl[0]

    # ---------------------------------------------------------- mouth helpers
    def gen_mouth_mask(self, lms2d):
        """Square mouth boxes from landmarks 48..59 (reference :330-344).

        lms2d: (N, 68, 2) in [-1, 1]. Returns int32 (N, 4): y0, y1, x0, x1
        with y1-y0 == x1-x0 == 2*(mask_res//2).
        """
        half_res = self.uv_resolution / 2  # 128 at the reference's 256
        lm = jax.lax.stop_gradient(lms2d) * half_res + half_res
        outer = lm[:, 48:60]
        mouth_avg = (outer[:, 0] + outer[:, 6]) * 0.5  # (N, 2)
        ups = jnp.max(outer[..., 0], axis=1)
        bottoms = jnp.min(outer[..., 0], axis=1)
        lefts = jnp.min(outer[..., 1], axis=1)
        rights = jnp.max(outer[..., 1], axis=1)
        mask_res = jnp.floor(jnp.maximum(ups - bottoms, rights - lefts) * 1.2)
        half = jnp.floor(mask_res / 2).astype(jnp.int32)
        cy = jnp.floor(mouth_avg[:, 1]).astype(jnp.int32)
        cx = jnp.floor(mouth_avg[:, 0]).astype(jnp.int32)
        size = 2 * half
        # clamp into the canvas (the reference would crash on OOB slices; in
        # practice FLAME mouths are interior)
        y0 = jnp.clip(cy - half, 0, self.uv_resolution - size)
        x0 = jnp.clip(cx - half, 0, self.uv_resolution - size)
        return jnp.stack([y0, y0 + size, x0, x0 + size], axis=1)

    def _mouth_pipeline(self, params, rendering_front, lm2d_front, eg3d_ws,
                        noise_mode, rng):
        boxes = self.gen_mouth_mask(lm2d_front)  # (N, 4)
        size = boxes[:, 1] - boxes[:, 0]
        # perf mode: the dynamic-window crop/paste resamplers run bf16 (the
        # same policy as the bf16 synthesis blocks they feed); parity mode
        # (force_fp32=True) keeps them fp32/HIGHEST
        front = rendering_front if self.force_fp32 \
            else rendering_front.astype(jnp.bfloat16)
        crop = jax.vmap(
            lambda img, b, s: resample_region(img, b[0], b[2], s, s, 64, 64)
        )(front, boxes, size)
        mouths_plane = self.mouth_backbone.synthesis(
            params['mouth_backbone']['synthesis'], crop, eg3d_ws,
            noise_mode=noise_mode, rng=_fold(rng, 1),
            force_fp32=self.force_fp32)
        stitched = jax.vmap(
            lambda img, patch, b, s: paste_resized_region(img, patch, b[0],
                                                          b[2], s, s)
        )(front, mouths_plane.astype(front.dtype), boxes, size)
        return self.neural_blending.synthesis(
            params['neural_blending']['synthesis'], stitched, eg3d_ws,
            noise_mode=noise_mode, rng=_fold(rng, 2),
            force_fp32=self.force_fp32)

    # ----------------------------------------------------------- plane build
    def build_planes(self, params, ws, v, noise_mode='random', rng=None,
                     **synthesis_kwargs):
        """texture -> rasterize -> mouth -> blend -> static mix
        (the shared trunk of synthesis/sample/sample_mixed)."""
        if self.load_lms:
            assert v.shape[1] > N_FLAME_VERTS, (
                f"v must be FLAME verts (+) landmarks: got {v.shape[1]} rows, "
                f"expected {N_FLAME_VERTS} verts followed by 2D landmarks "
                f"(reference: triplane_next3d.py:119-120)")
            v, lms = v[:, :N_FLAME_VERTS], v[:, N_FLAME_VERTS:]
        n_tex = self.texture_backbone.num_ws
        eg3d_ws, texture_ws = ws[:, :n_tex], ws[:, n_tex:]

        with jax.named_scope('texture_backbone'):
            textures = self.texture_backbone.synthesis(
                params['texture_backbone']['synthesis'], texture_ws,
                noise_mode=noise_mode, rng=_fold(rng, 0),
                force_fp32=self.force_fp32, **synthesis_kwargs)

        with jax.named_scope('static_backbone'):
            static_plane = self.backbone.synthesis(
                params['backbone']['synthesis'], eg3d_ws, noise_mode=noise_mode,
                rng=_fold(rng, 3), force_fp32=self.force_fp32,
                **synthesis_kwargs)
        N = static_plane.shape[0]
        static_plane = static_plane.reshape(N, 3, 32,
                                            *static_plane.shape[-2:])
        planes = self.mix_planes_from_identity(
            params, eg3d_ws, textures, static_plane, v, lms,
            noise_mode=noise_mode, rng=rng)
        return planes, eg3d_ws

    def mix_planes_from_identity(self, params, eg3d_ws, textures,
                                 static_plane, v, lms, noise_mode='random',
                                 rng=None):
        """Expression-dependent tail: rasterize -> mouth -> blend -> alpha
        mix. Identity inputs (textures, static_plane) can be CACHED per
        subject — the reference recomputes them per frame
        (SURVEY section 3.5, the reenact FPS lever)."""
        with jax.named_scope('rasterize'):
            images, alphas, lm2d_front = self.rasterize(params, v, lms,
                                                        textures)
        with jax.named_scope('mouth_pipeline'):
            blended_front = self._mouth_pipeline(params, images[0], lm2d_front,
                                                 eg3d_ws, noise_mode, rng)
        alpha_image = jnp.stack(alphas, axis=1)  # (N, 3, 1, H, W)
        stitch = jnp.concatenate([blended_front, images[1], images[2]], axis=1)
        stitch = stitch.reshape(static_plane.shape)
        return stitch * alpha_image + static_plane * (1 - alpha_image)

    def synthesis_from_identity(self, params, ws, textures, static_plane,
                                c, v, neural_rendering_resolution=None,
                                noise_mode='random', rng=None):
        """Full synthesis with precomputed identity (textures/static plane)."""
        if self.load_lms:
            v, lms = v[:, :N_FLAME_VERTS], v[:, N_FLAME_VERTS:]
        else:
            lms = None
        eg3d_ws = ws[:, :self.texture_backbone.num_ws]
        planes = self.mix_planes_from_identity(
            params, eg3d_ws, textures, static_plane, v, lms,
            noise_mode=noise_mode, rng=rng)
        return self._render_from_planes(params, planes, eg3d_ws, c,
                                        neural_rendering_resolution,
                                        noise_mode, rng)

    # -------------------------------------------------------------- synthesis
    def synthesis(self, params, ws, c, v, neural_rendering_resolution=None,
                  noise_mode='random', rng=None, **synthesis_kwargs):
        blended_planes, eg3d_ws = self.build_planes(
            params, ws, v, noise_mode=noise_mode, rng=rng, **synthesis_kwargs)
        return self._render_from_planes(params, blended_planes, eg3d_ws, c,
                                        neural_rendering_resolution,
                                        noise_mode, rng)

    def _render_from_planes(self, params, blended_planes, eg3d_ws, c,
                            neural_rendering_resolution, noise_mode, rng):
        cam2world = c[:, :16].reshape(-1, 4, 4)
        intrinsics = c[:, 16:25].reshape(-1, 3, 3)
        nrr = neural_rendering_resolution or self.neural_rendering_resolution

        ray_origins, ray_directions = sample_rays(cam2world, intrinsics, nrr)
        N, M, _ = ray_origins.shape

        with jax.named_scope('volume_render'):
            feature_samples, depth_samples, _ = self.renderer(
                _fold(rng, 4), blended_planes,
                (params['decoder'], self.decoder), ray_origins,
                ray_directions, self.rendering_kwargs)

        H = W = nrr
        feature_image = feature_samples.transpose(0, 2, 1).reshape(
            N, feature_samples.shape[-1], H, W)
        depth_image = depth_samples.transpose(0, 2, 1).reshape(N, 1, H, W)

        rgb_image = feature_image[:, :3]
        sr_noise = self.rendering_kwargs.get('superresolution_noise_mode',
                                             noise_mode)
        with jax.named_scope('superresolution'):
            sr_image = self.superresolution(
                params['superresolution'], rgb_image, feature_image, eg3d_ws,
                noise_mode=sr_noise, rng=_fold(rng, 5),
                force_fp32=self.force_fp32)

        return {'image': sr_image, 'image_raw': rgb_image,
                'image_depth': depth_image}

    # ------------------------------------------------------------------ sample
    def sample_mixed(self, params, coordinates, directions, ws, v,
                     noise_mode='random', rng=None, **synthesis_kwargs):
        """Density/color at arbitrary 3D points (reference :278-323)."""
        blended_planes, _ = self.build_planes(params, ws, v,
                                              noise_mode=noise_mode, rng=rng,
                                              **synthesis_kwargs)
        return self.renderer.run_model(
            blended_planes, (params['decoder'], self.decoder), coordinates,
            directions, self.rendering_kwargs, rng=_fold(rng, 6))

    def sample(self, params, coordinates, directions, z, c, v,
               truncation_psi=1, truncation_cutoff=None, **kwargs):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.sample_mixed(params, coordinates, directions, ws, v,
                                 **kwargs)

    def sample_with_planes(self, params, blended_planes, coordinates,
                           directions, rng=None):
        """Decode σ/rgb from PREBUILT planes — the hoisted shape-extraction
        path (chunk loops reuse planes; cf. SURVEY Appendix A)."""
        return self.renderer.run_model(
            blended_planes, (params['decoder'], self.decoder), coordinates,
            directions, self.rendering_kwargs, rng=rng)

    # ------------------------------------------------------------------ forward
    def __call__(self, params, z, c, v, truncation_psi=1,
                 truncation_cutoff=None, neural_rendering_resolution=None,
                 **synthesis_kwargs):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params, ws, c, v,
                              neural_rendering_resolution=neural_rendering_resolution,
                              **synthesis_kwargs)


def _fold(rng, i):
    return None if rng is None else jax.random.fold_in(rng, i)


@register('TriPlaneGenerator')
@register('next3d')
def build_generator(**kwargs):
    return TriPlaneGenerator(**kwargs)
