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

    B = gh * gw
    vb = np.repeat(v, B, 0)

    # all grid cells render as ONE batched call per frame (the reference
    # loops cells in python, gen_videos_next3d.py:126-140)
    @jax.jit
    def render(params, w, c):
        return G.synthesis(params, w, c, vb, noise_mode='const')['image']

    # identity caching (VERDICT r2 #9 / SURVEY section 3.5): with a single
    # keyframe per cell (the flagship 2x2-orbit config) the interpolated w
    # is CONSTANT across frames, so the neural texture and static tri-plane
    # are identity-only — build them once and re-run only
    # rasterize -> mouth -> blend -> render -> SR per frame, exactly like
    # the reenact fast path.
    @jax.jit
    def identity(params, w):
        n_tex = G.texture_backbone.num_ws
        eg3d_ws, texture_ws = w[:, :n_tex], w[:, n_tex:]
        textures = G.texture_backbone.synthesis(
            params['texture_backbone']['synthesis'], texture_ws,
            noise_mode='const')
        static = G.backbone.synthesis(params['backbone']['synthesis'],
                                      eg3d_ws, noise_mode='const')
        static = static.reshape(static.shape[0], 3, 32, *static.shape[-2:])
        return textures, static

    @jax.jit
    def render_cached(params, w, textures, static, c):
        return G.synthesis_from_identity(params, w, textures, static, c, vb,
                                         noise_mode='const')['image']

    cached = num_keyframes == 1
    if cached:
        w_const = jnp.asarray(ws[:, :, 0].reshape(B, *ws.shape[3:]),
                              jnp.float32)
        textures, static = identity(params, w_const)
    else:
        # one cubic interpolator per cell, hoisted out of the frame loop
        x = np.arange(-num_keyframes, num_keyframes * 2)
        interps = [
            sinterp.interp1d(x, np.tile(ws[yi, xi], (3, 1, 1)), kind='cubic',
                             axis=0)
            for yi in range(gh) for xi in range(gw)]

    video_path = os.path.join(outdir, 'interpolation.mp4')
    from ..utils.video import VideoWriter
    writer = VideoWriter(video_path, fps=fps)
    total = num_keyframes * w_frames
    for frame_idx in range(total):
        pitch = -0.25 * np.sin(2 * math.pi * frame_idx / total)
        yaw = 0.35 * np.sin(2 * math.pi * frame_idx / total)
        c = np.repeat(camera_label(yaw, pitch), B, 0)
        if cached:
            imgs = np.asarray(render_cached(params, w_const, textures,
                                            static, c))
        else:
            w = np.stack([f(frame_idx / w_frames) for f in interps])
            imgs = np.asarray(render(params, jnp.asarray(w, jnp.float32), c))
        H = imgs.shape[-1]
        canvas = np.zeros((3, gh * H, gw * H), np.float32)
        for i in range(B):
            yy, xx = divmod(i, gw)
            canvas[:, yy * H:(yy + 1) * H, xx * H:(xx + 1) * H] = imgs[i]
        frame = np.clip((canvas.transpose(1, 2, 0) + 1) * 127.5,
                        0, 255).astype(np.uint8)
        writer.append(frame)
    out = writer.close()
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
