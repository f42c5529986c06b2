"""Generate images (and optional shape volumes) from a trained generator.

Behavioral spec: gen_samples_next3d.py:120-254 — per seed, render 3 yaw
angles conditioned on the frontal pose, concatenate horizontally; optional
512^3 sigma-grid shape extraction to .mrc / marching-cubes .ply.

TPU-first: the tri-planes are built ONCE per seed and the sigma grid is
decoded from the cached planes in jit-compiled chunks (the reference rebuilds
texture+rasterize+mouth+blend per 1M-point chunk, SURVEY Appendix A).
"""

from __future__ import annotations

import math
import os

import click
import numpy as np

from .common import (build_generator_from_kwargs, camera_label,
                     load_demo_verts, parse_range, save_image_grid)


@click.command()
@click.option('--network', 'network_path', required=True)
@click.option('--seeds', type=parse_range, default='0-3')
@click.option('--trunc', 'truncation_psi', type=float, default=0.7)
@click.option('--trunc-cutoff', 'truncation_cutoff', type=int, default=14)
@click.option('--outdir', type=str, required=True)
@click.option('--shapes', type=bool, default=False)
@click.option('--shape-res', type=int, default=512)
@click.option('--fov-deg', type=float, default=18.837)
@click.option('--obj-path', type=str,
              default='/root/reference/data/demo/demo.obj')
@click.option('--lms-path', type=str,
              default='/root/reference/data/demo/demo_kpt2d.txt')
@click.option('--shape-format', type=click.Choice(['.mrc', '.ply']),
              default='.mrc')
@click.option('--batch', 'max_batch', type=int, default=1000000)
def main(network_path, seeds, truncation_psi, truncation_cutoff, outdir,
         shapes, shape_res, fov_deg, obj_path, lms_path, shape_format,
         max_batch):
    generate_images(network_path, seeds, truncation_psi, truncation_cutoff,
                    outdir, shapes, shape_res, fov_deg, obj_path, lms_path,
                    shape_format, max_batch)


def generate_images(network_path, seeds, truncation_psi=0.7,
                    truncation_cutoff=14, outdir='out', shapes=False,
                    shape_res=512, fov_deg=18.837,
                    obj_path='/root/reference/data/demo/demo.obj',
                    lms_path='/root/reference/data/demo/demo_kpt2d.txt',
                    shape_format='.mrc', max_batch=1000000,
                    topology_path=None, generator=None, params=None):
    import jax
    import jax.numpy as jnp
    from ..utils.checkpoint import load_any_generator

    os.makedirs(outdir, exist_ok=True)

    if generator is None:
        params, init_kwargs = load_any_generator(network_path)
        G = build_generator_from_kwargs(init_kwargs,
                                        topology_path or obj_path)
    else:
        G = generator

    v = load_demo_verts(obj_path, lms_path)
    cond_c = camera_label(0, 0, fov=fov_deg)  # frontal conditioning

    @jax.jit
    def render(params, z, c):
        ws = G.mapping(params, z, cond_c, truncation_psi=truncation_psi,
                       truncation_cutoff=truncation_cutoff)
        return G.synthesis(params, ws, c, v, noise_mode='const')['image']

    angles = [(0.4, 0), (0, 0), (-0.4, 0)]  # reference :188
    for seed in seeds:
        z = np.random.RandomState(seed).randn(1, G.z_dim).astype(np.float32)
        imgs = []
        for yaw, pitch in angles:
            c = camera_label(yaw, pitch, fov=fov_deg)
            imgs.append(np.asarray(render(params, jnp.asarray(z), c)))
        row = np.concatenate(imgs, axis=3)  # concat along width
        save_image_grid(row, os.path.join(outdir, f'seed{seed:04d}.png'))
        print(f'wrote {outdir}/seed{seed:04d}.png')

        if shapes:
            extract_shape(G, params, z, cond_c, v, shape_res, max_batch,
                          os.path.join(outdir, f'seed{seed:04d}{shape_format}'),
                          truncation_psi, truncation_cutoff)


def extract_shape(G, params, z, cond_c, v, shape_res, max_batch, out_path,
                  truncation_psi=0.7, truncation_cutoff=14):
    """512^3 sigma grid -> .mrc / marching-cubes .ply
    (reference gen_samples_next3d.py:208-246), with planes built once."""
    import jax
    import jax.numpy as jnp
    from ..render.shape_utils import create_samples, save_mrc, save_ply_from_sigma

    ws = G.mapping(params, jnp.asarray(z), cond_c,
                   truncation_psi=truncation_psi,
                   truncation_cutoff=truncation_cutoff)
    planes, _ = G.build_planes(params, ws, jnp.asarray(v), noise_mode='const')

    samples, voxel_origin, voxel_size = create_samples(
        N=shape_res, cube_length=G.rendering_kwargs['box_warp'] * 1)

    # the sample axis is embarrassingly parallel: shard it across ALL local
    # devices (planes/params replicated; XLA partitions the tri-plane
    # gather + decoder MLP with zero collectives until the host fetch) —
    # the reference chunk-loops on ONE GPU (gen_samples_next3d.py:210-226);
    # SURVEY section 5.7 / VERDICT r2 #8.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import data_parallel_mesh
    devices = jax.devices()
    mesh = data_parallel_mesh(devices)
    shard = NamedSharding(mesh, P(None, 'data', None))

    @jax.jit
    def decode(planes, coords):
        out = G.sample_with_planes(params, planes, coords, coords)
        return out['sigma']

    sigmas = np.zeros((samples.shape[0],), np.float32)
    # chunk must split evenly over the device axis
    chunk = min(max_batch * len(devices), samples.shape[0])
    chunk = -(-chunk // len(devices)) * len(devices)
    n_chunks = -(-samples.shape[0] // chunk)
    padded = np.zeros((n_chunks * chunk, 3), np.float32)
    padded[:samples.shape[0]] = samples
    for i in range(n_chunks):
        part = jax.device_put(padded[i * chunk:(i + 1) * chunk][None], shard)
        s = np.asarray(decode(planes, part))[0, :, 0]
        lo = i * chunk
        hi = min((i + 1) * chunk, samples.shape[0])
        sigmas[lo:hi] = s[:hi - lo]
    sigmas = sigmas.reshape(shape_res, shape_res, shape_res)

    # border padding to -1000 (reference :232-239)
    pad = int(30 * shape_res / 256)
    pv = -1000.0
    sigmas[:pad] = pv; sigmas[-pad:] = pv
    sigmas[:, :pad] = pv; sigmas[:, -pad:] = pv
    sigmas[:, :, :pad] = pv; sigmas[:, :, -pad:] = pv

    if out_path.endswith('.mrc'):
        save_mrc(out_path, sigmas)
    else:
        save_ply_from_sigma(out_path, sigmas, level=10.0)
    print(f'wrote {out_path}')


if __name__ == '__main__':
    main()
