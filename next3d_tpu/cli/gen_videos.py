"""Render orbit-interpolation videos from a trained generator.

Behavioral spec: gen_videos_next3d.py:88-336 — w-latent keyframe cubic
interpolation across seeds with an orbiting camera (yaw +-0.35, pitch +-0.25
around the frontal pose), written as an mp4 grid at 60 fps.

TPU-first: the per-frame synthesis is one jitted function; identity textures
and the static plane depend only on ws, so consecutive frames reuse the
compiled graph with new (ws, camera) inputs.
"""

from __future__ import annotations

import math
import os

import click
import numpy as np

from .common import (build_generator_from_kwargs, camera_label,
                     load_demo_verts, parse_range)


@click.command()
@click.option('--network', 'network_path', required=True)
@click.option('--seeds', type=parse_range, default='0-3')
@click.option('--trunc', 'truncation_psi', type=float, default=0.7)
@click.option('--trunc-cutoff', 'truncation_cutoff', type=int, default=14)
@click.option('--grid', type=str, default='2x2')
@click.option('--outdir', type=str, required=True)
@click.option('--w-frames', type=int, default=120)
@click.option('--fps', type=int, default=60)
@click.option('--obj-path', type=str,
              default='/root/reference/data/demo/demo.obj')
@click.option('--lms-path', type=str,
              default='/root/reference/data/demo/demo_kpt2d.txt')
def main(network_path, seeds, truncation_psi, truncation_cutoff, grid, outdir,
         w_frames, fps, obj_path, lms_path):
    generate_video(network_path, seeds, truncation_psi, truncation_cutoff,
                   grid, outdir, w_frames, fps, obj_path, lms_path)


def generate_video(network_path, seeds, truncation_psi=0.7,
                   truncation_cutoff=14, grid='2x2', outdir='out',
                   w_frames=120, fps=60,
                   obj_path='/root/reference/data/demo/demo.obj',
                   lms_path='/root/reference/data/demo/demo_kpt2d.txt',
                   generator=None, params=None):
    import jax
    import jax.numpy as jnp
    from scipy import interpolate as sinterp
    from ..utils.checkpoint import load_any_generator

    os.makedirs(outdir, exist_ok=True)
    gw, gh = (int(x) for x in grid.split('x'))
    seeds = list(seeds)
    if len(seeds) < gw * gh:
        seeds = (seeds * (gw * gh))[:gw * gh]

    if generator is None:
        params, init_kwargs = load_any_generator(network_path)
        G = build_generator_from_kwargs(init_kwargs, obj_path)
    else:
        G = generator

    v = load_demo_verts(obj_path, lms_path)
    cond_c = camera_label(0, 0)

    # keyframe ws per seed (cubic loop interpolation, reference :105-117)
    zs = np.stack([np.random.RandomState(s).randn(G.z_dim) for s in seeds])
    ws = np.asarray(G.mapping(params, jnp.asarray(zs, jnp.float32),
                              np.repeat(cond_c, len(seeds), 0),
                              truncation_psi=truncation_psi,
                              truncation_cutoff=truncation_cutoff))
    num_keyframes = len(seeds) // (gw * gh)
    ws = ws.reshape(gh, gw, num_keyframes, *ws.shape[1:])

    @jax.jit
    def render(params, w, c):
        return G.synthesis(params, w, c, v, noise_mode='const')['image']

    video_path = os.path.join(outdir, 'interpolation.mp4')
    from ..utils.video import VideoWriter
    writer = VideoWriter(video_path, fps=fps)
    total = num_keyframes * w_frames
    for frame_idx in range(total):
        imgs = []
        for yi in range(gh):
            for xi in range(gw):
                # cubic interp over keyframes, looped
                kf = ws[yi, xi]
                x = np.arange(-num_keyframes, num_keyframes * 2)
                y = np.tile(kf, (3, 1, 1))
                interp = sinterp.interp1d(x, y, kind='cubic' if
                                          num_keyframes > 1 else 'nearest',
                                          axis=0)
                w = interp(frame_idx / w_frames)
                pitch = -0.25 * np.sin(2 * math.pi * frame_idx / total)
                yaw = 0.35 * np.sin(2 * math.pi * frame_idx / total)
                c = camera_label(yaw, pitch)
                img = np.asarray(render(params,
                                        jnp.asarray(w[None], jnp.float32), c))
                imgs.append(img[0])
        H = imgs[0].shape[-1]
        canvas = np.zeros((3, gh * H, gw * H), np.float32)
        for i, img in enumerate(imgs):
            yy, xx = divmod(i, gw)
            canvas[:, yy * H:(yy + 1) * H, xx * H:(xx + 1) * H] = img
        frame = np.clip((canvas.transpose(1, 2, 0) + 1) * 127.5,
                        0, 255).astype(np.uint8)
        writer.append(frame)
    out = writer.close()
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
