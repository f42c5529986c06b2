"""FLAME-driven avatar reenactment (the serving path).

Behavioral spec: reenact_avatar_next3d.py:88-174 — fixed identity ws from a
frontal conditioning pose; per driving frame, load FLAME verts + landmarks
and the (3-frame smoothed) camera label, synthesize, write side-by-side mp4.

TPU-first FPS levers (SURVEY section 3.5): the identity neural texture and
static tri-plane depend only on ws, so they are computed ONCE per identity
and only rasterize -> mouth -> blend -> render -> SR runs per frame
(``reenact_step``); per-frame mesh/landmark text parsing is prebaked to
arrays before the render loop starts.
"""

from __future__ import annotations

import json
import os

import click
import numpy as np

from .common import build_generator_from_kwargs, camera_label, parse_range


@click.command()
@click.option('--network', 'network_path', required=True)
@click.option('--drive-root', type=str, required=True,
              help='driving dir: dataset.json + per-frame .obj + _kpt2d.txt')
@click.option('--seeds', type=parse_range, default='166')
@click.option('--trunc', 'truncation_psi', type=float, default=0.7)
@click.option('--trunc-cutoff', 'truncation_cutoff', type=int, default=14)
@click.option('--outdir', type=str, required=True)
@click.option('--fps', type=int, default=30)
@click.option('--topology-path', type=str,
              default='/root/reference/data/demo/demo.obj')
def main(network_path, drive_root, seeds, truncation_psi, truncation_cutoff,
         outdir, fps, topology_path):
    reenact(network_path, drive_root, seeds, truncation_psi,
            truncation_cutoff, outdir, fps, topology_path)


def load_driving_sequence(drive_root):
    """Per-frame (camera label, verts, lms) arrays from a driving dir
    (reference reenact_avatar_next3d.py:125-154; layout README.md:76-83)."""
    from ..utils.obj_io import load_lms, load_obj_verts
    with open(os.path.join(drive_root, 'dataset.json')) as f:
        labels = json.load(f)['labels']
    labels = sorted(labels, key=lambda kv: kv[0])
    frames = []
    for fname, label in labels:
        stem = os.path.splitext(os.path.basename(fname))[0]
        obj = os.path.join(drive_root, stem + '.obj')
        kpt = os.path.join(drive_root, stem + '_kpt2d.txt')
        if not (os.path.exists(obj) and os.path.exists(kpt)):
            continue
        verts = load_obj_verts(obj)
        lms = load_lms(kpt)
        frames.append((np.asarray(label, np.float32),
                       np.concatenate([verts, lms], 0).astype(np.float32)))
    if not frames:
        raise IOError(f'no driving frames under {drive_root}')
    cs = np.stack([f[0] for f in frames])
    vs = np.stack([f[1] for f in frames])
    return cs, vs


def smooth_cameras(cs, window=3):
    """3-frame camera smoothing (reference :159)."""
    out = cs.copy()
    for i in range(len(cs)):
        lo = max(0, i - window + 1)
        out[i] = cs[lo:i + 1].mean(0)
    return out


def reenact(network_path, drive_root, seeds=(166,), truncation_psi=0.7,
            truncation_cutoff=14, outdir='out', fps=30,
            topology_path='/root/reference/data/demo/demo.obj',
            generator=None, params=None):
    import jax
    import jax.numpy as jnp
    from ..utils.checkpoint import load_any_generator

    os.makedirs(outdir, exist_ok=True)
    if generator is None:
        params, init_kwargs = load_any_generator(network_path)
        G = build_generator_from_kwargs(init_kwargs, topology_path)
    else:
        G = generator

    cs, vs = load_driving_sequence(drive_root)
    cs = smooth_cameras(cs)
    cond_c = camera_label(0, 0)

    # identity planes cached per seed: texture + static plane built once
    @jax.jit
    def identity(params, z):
        ws = G.mapping(params, z, cond_c, truncation_psi=truncation_psi,
                       truncation_cutoff=truncation_cutoff)
        n_tex = G.texture_backbone.num_ws
        eg3d_ws, texture_ws = ws[:, :n_tex], ws[:, n_tex:]
        textures = G.texture_backbone.synthesis(
            params['texture_backbone']['synthesis'], texture_ws,
            noise_mode='const')
        static = G.backbone.synthesis(params['backbone']['synthesis'],
                                      eg3d_ws, noise_mode='const')
        static = static.reshape(static.shape[0], 3, 32, *static.shape[-2:])
        return ws, textures, static

    @jax.jit
    def reenact_step(params, ws, textures, static_plane, c, v):
        return G.synthesis_from_identity(params, ws, textures, static_plane,
                                         c, v, noise_mode='const')['image']

    for seed in seeds:
        z = jnp.asarray(np.random.RandomState(seed)
                        .randn(1, G.z_dim).astype(np.float32))
        ws, textures, static = identity(params, z)
        path = os.path.join(outdir, f'reenact_seed{seed:04d}.mp4')
        from ..utils.video import VideoWriter
        writer = VideoWriter(path, fps=fps)
        for i in range(len(cs)):
            img = np.asarray(reenact_step(params, ws, textures, static,
                                          cs[i][None], vs[i][None]))
            frame = np.clip((img[0].transpose(1, 2, 0) + 1) * 127.5,
                            0, 255).astype(np.uint8)
            writer.append(frame)
        out = writer.close()
        print(f'wrote {out} ({len(cs)} frames)')


if __name__ == '__main__':
    main()
