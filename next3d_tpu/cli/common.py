"""Shared CLI helpers: generator construction from configs/checkpoints,
camera math, image saving."""

from __future__ import annotations

import math
import os
import re
from typing import Optional, Tuple

import numpy as np

# default ffhq rendering config (reference train_next3d.py:330-339)
FFHQ_RENDERING_KWARGS = dict(
    image_resolution=512,
    disparity_space_sampling=False,
    clamp_mode='softplus',
    superresolution_module='SuperresolutionHybrid8XDC',
    c_gen_conditioning_zero=False,
    gpc_reg_prob=0.5,
    c_scale=1.0,
    superresolution_noise_mode='none',
    density_reg=0.25,
    density_reg_p_dist=0.004,
    reg_type='l1',
    decoder_lr_mul=1.0,
    sr_antialias=True,
    depth_resolution=48,
    depth_resolution_importance=48,
    ray_start=2.25,
    ray_end=3.3,
    box_warp=1.0,
    avg_camera_radius=2.7,
    avg_camera_pivot=[0, 0, 0.2],
)


# per-dataset rendering blocks (reference train_next3d.py:330-360); ffhq's
# values live in FFHQ_RENDERING_KWARGS above
CFG_RENDERING_BLOCKS = {
    'ffhq': dict(
        depth_resolution=48, depth_resolution_importance=48,
        ray_start=2.25, ray_end=3.3, box_warp=1.0,
        avg_camera_radius=2.7, avg_camera_pivot=[0, 0, 0.2]),
    'afhq': dict(
        depth_resolution=36, depth_resolution_importance=36,
        ray_start=2.25, ray_end=3.3, box_warp=1.0,
        avg_camera_radius=2.7, avg_camera_pivot=[0, 0, -0.06]),
    'shapenet': dict(
        depth_resolution=64, depth_resolution_importance=64,
        ray_start=0.1, ray_end=2.6, box_warp=1.6, white_back=True,
        avg_camera_radius=1.7, avg_camera_pivot=[0, 0, 0]),
}


def build_generator_from_kwargs(init_kwargs, topology_path,
                                uv_face_eye_mask_path=None):
    """Construct our TriPlaneGenerator from reference init_kwargs (as stored
    in checkpoints) or our own config dicts."""
    from ..models import TriPlaneGenerator

    kw = dict(init_kwargs or {})
    kw.pop('class_name', None)
    kw.setdefault('z_dim', 512)
    kw.setdefault('c_dim', 25)
    kw.setdefault('w_dim', 512)
    kw.setdefault('img_resolution', 512)
    kw.setdefault('img_channels', 3)
    rendering = dict(FFHQ_RENDERING_KWARGS)
    rendering.update(kw.pop('rendering_kwargs', {}) or {})
    # strip torch-only knobs
    for k in ('channel_base', 'channel_max', 'fused_modconv_default',
              'num_fp16_res', 'conv_clamp'):
        kw.setdefault(k, None)
        if kw[k] is None:
            kw.pop(k)
    kw.pop('topology_path', None)
    allowed = ('z_dim', 'c_dim', 'w_dim', 'img_resolution', 'img_channels',
               'sr_num_fp16_res', 'mapping_kwargs', 'sr_kwargs',
               'channel_base', 'channel_max', 'plane_resolution',
               'rasterizer_patch', 'rasterizer_face_chunk')
    kw = {k: v for k, v in kw.items() if k in allowed}
    return TriPlaneGenerator(topology_path=topology_path,
                             uv_face_eye_mask_path=uv_face_eye_mask_path,
                             rendering_kwargs=rendering, **kw)


def camera_label(yaw, pitch, lookat=(0, 0, 0.2), radius=2.7, fov=18.837):
    """25-dim camera label (16 cam2world + 9 intrinsics)."""
    import jax.numpy as jnp
    from ..render import camera_utils
    cam = camera_utils.lookat_pose(math.pi / 2 + yaw, math.pi / 2 + pitch,
                                   jnp.asarray(lookat, jnp.float32),
                                   radius=radius)
    K = camera_utils.fov_to_intrinsics(fov)
    return np.concatenate([np.asarray(cam).reshape(1, 16),
                           K.reshape(1, 9)], axis=1).astype(np.float32)


def load_demo_verts(obj_path, lms_path):
    from ..utils.obj_io import load_lms, load_obj_verts
    verts = load_obj_verts(obj_path)
    lms = load_lms(lms_path)
    return np.concatenate([verts, lms], axis=0)[None].astype(np.float32)


def save_image_grid(img, path, drange=(-1, 1), grid_size=None):
    """uint8 PNG from (N, C, H, W) float images (reference training_loop
    save_image_grid behavior)."""
    from PIL import Image
    lo, hi = drange
    img = np.asarray(img, dtype=np.float32)
    img = (img - lo) * (255 / (hi - lo))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    N, C, H, W = img.shape
    if grid_size is None:
        gw = int(np.ceil(np.sqrt(N)))
        gh = int(np.ceil(N / gw))
    else:
        gw, gh = grid_size
    canvas = np.zeros((C, gh * H, gw * W), np.uint8)
    for i in range(N):
        y, x = divmod(i, gw)
        canvas[:, y * H:(y + 1) * H, x * W:(x + 1) * W] = img[i]
    canvas = canvas.transpose(1, 2, 0)
    if C == 1:
        canvas = canvas[:, :, 0]
    Image.fromarray(canvas).save(path)


def parse_range(s) -> list:
    """'1,2,5-7' -> [1, 2, 5, 6, 7] (reference gen_samples_next3d.py)."""
    if isinstance(s, (list, tuple)):
        return list(s)
    out = []
    for p in str(s).split(','):
        m = re.match(r'^(\d+)-(\d+)$', p)
        if m:
            out.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.append(int(p))
    return out
