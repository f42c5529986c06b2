"""Train the Next3D TPU generator (GAN loop, data parallel over ICI).

Behavioral spec: train_next3d.py:224-422 — the same knob inventory mapped to
our config; per-dataset rendering options (ffhq defaults:
train_next3d.py:330-339); SR module by resolution (:301-308); lazy-reg
intervals G=4 / D=16; EMA kimg = batch*10/32 (:294).
"""

from __future__ import annotations

import json
import os
import re

import click
import numpy as np

from .common import FFHQ_RENDERING_KWARGS


def choose_sr_module(resolution):
    """reference train_next3d.py:301-308."""
    return {512: 'SuperresolutionHybrid8XDC',
            256: 'SuperresolutionHybrid4X',
            128: 'SuperresolutionHybrid2X'}[resolution]


@click.command()
@click.option('--outdir', required=True)
@click.option('--data', 'data_path', required=True)
@click.option('--gpus', 'num_devices', type=int, default=None,
              help='devices to use (default: all)')
@click.option('--batch', 'batch_size', type=int, default=32)
@click.option('--gamma', 'r1_gamma', type=float, default=4.0)
@click.option('--kimg', 'total_kimg', type=int, default=25000)
@click.option('--tick', 'kimg_per_tick', type=int, default=4)
@click.option('--snap', 'snapshot_ticks', type=int, default=20)
@click.option('--glr', type=float, default=0.0025)
@click.option('--dlr', type=float, default=0.002)
@click.option('--cbase', 'channel_base', type=int, default=32768)
@click.option('--cmax', 'channel_max', type=int, default=512)
@click.option('--gen-pose-cond', type=bool, default=False)
@click.option('--gen-exp-cond', type=bool, default=False,
              help='expression labels via a second D mapping (reference '
                   'training_loop.py:162-176)')
@click.option('--gpc-reg-prob', type=float, default=0.5)
@click.option('--density-reg', type=float, default=0.25)
@click.option('--resume', 'resume_path', type=str, default=None)
@click.option('--seed', type=int, default=0)
@click.option('--topology-path', type=str,
              default='/root/reference/data/demo/demo.obj')
@click.option('--eye-mask-path', type=str, default=None)
@click.option('--resolution', type=int, default=512)
@click.option('--sr-num-fp16-res', type=int, default=4)
@click.option('--neural-rendering-resolution-initial', type=int, default=64)
@click.option('--blur-fade-kimg', type=float, default=200.0)
@click.option('--plane-resolution', type=int, default=256)
@click.option('--dry-run', is_flag=True)
def main(**opts):
    train(**opts)


def train(outdir, data_path, num_devices=None, batch_size=32, r1_gamma=4.0,
          gen_exp_cond=False,
          total_kimg=25000, kimg_per_tick=4, snapshot_ticks=20, glr=0.0025,
          dlr=0.002, channel_base=32768, channel_max=512,
          gen_pose_cond=False, gpc_reg_prob=0.5, density_reg=0.25,
          resume_path=None, seed=0,
          topology_path='/root/reference/data/demo/demo.obj',
          eye_mask_path=None, resolution=512, sr_num_fp16_res=4,
          neural_rendering_resolution_initial=64, blur_fade_kimg=200.0,
          plane_resolution=256, dry_run=False):
    import jax

    from ..data import ImageFolderDataset, make_data_iterator
    from ..models import TriPlaneGenerator
    from ..nn import DualDiscriminator
    from ..train import (LossConfig, StyleGAN2Loss, TrainStep, make_optimizer)
    from ..train.training_loop import training_loop

    rendering_kwargs = dict(FFHQ_RENDERING_KWARGS)
    rendering_kwargs.update(
        c_gen_conditioning_zero=not gen_pose_cond,
        gpc_reg_prob=gpc_reg_prob if gen_pose_cond else None,
        density_reg=density_reg,
        superresolution_module=choose_sr_module(resolution),
        superresolution_noise_mode='none',
        image_resolution=resolution,
    )

    G = TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=resolution,
        img_channels=3, topology_path=topology_path,
        uv_face_eye_mask_path=eye_mask_path,
        rendering_kwargs=rendering_kwargs, sr_num_fp16_res=sr_num_fp16_res,
        channel_base=channel_base, channel_max=channel_max,
        plane_resolution=plane_resolution)
    if gen_exp_cond:
        from ..nn import DualLabelDualDiscriminator
        D = DualLabelDualDiscriminator(
            c_dim=25, c2_dim=50, img_resolution=resolution, img_channels=3,
            channel_base=channel_base, channel_max=channel_max)
    else:
        D = DualDiscriminator(c_dim=25, img_resolution=resolution,
                              img_channels=3, channel_base=channel_base,
                              channel_max=channel_max)

    loss_cfg = LossConfig(
        r1_gamma=r1_gamma,
        gpc_reg_prob=gpc_reg_prob if gen_pose_cond else None,
        density_reg=density_reg,
        neural_rendering_resolution_initial=neural_rendering_resolution_initial,
        blur_init_sigma=10.0 if blur_fade_kimg > 0 else 0.0,
        blur_fade_kimg=blur_fade_kimg * batch_size / 32,
        dual_discrimination=True)
    from ..parallel import data_parallel_mesh
    loss_obj = StyleGAN2Loss(G, D, loss_cfg)
    devices = jax.devices()[:num_devices] if num_devices else None
    step = TrainStep(
        loss_obj,
        make_optimizer(glr, 0.0, 0.99, 1e-8, reg_interval=4),
        make_optimizer(dlr, 0.0, 0.99, 1e-8, reg_interval=16),
        mesh=data_parallel_mesh(devices))

    config = dict(outdir=outdir, data=data_path, batch=batch_size,
                  gamma=r1_gamma, kimg=total_kimg, glr=glr, dlr=dlr,
                  G_kwargs=dict(z_dim=512, c_dim=25, w_dim=512,
                                img_resolution=resolution, img_channels=3,
                                channel_base=channel_base,
                                channel_max=channel_max,
                                rendering_kwargs=rendering_kwargs,
                                plane_resolution=plane_resolution))
    if dry_run:
        print('dry run OK:')
        print(json.dumps(config, indent=2, default=str))
        return

    dataset = ImageFolderDataset(data_path, resolution=resolution)
    dataset.prebake()
    it = make_data_iterator(dataset, batch_size,
                            rank=jax.process_index(),
                            num_replicas=jax.process_count(), seed=seed)
    training_loop(G, D, loss_obj, step, it, run_dir=outdir,
                  total_kimg=total_kimg, batch_size=batch_size,
                  ema_kimg=batch_size * 10 / 32,
                  kimg_per_tick=kimg_per_tick, snapshot_ticks=snapshot_ticks,
                  resume_path=resume_path, seed=seed, config=config)


if __name__ == '__main__':
    main()
