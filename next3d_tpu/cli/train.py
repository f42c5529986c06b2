"""Train the Next3D TPU generator (GAN loop, data parallel over ICI).

Behavioral spec: train_next3d.py:224-422 — the same knob inventory mapped to
our config; per-dataset rendering options (ffhq defaults:
train_next3d.py:330-339); SR module by resolution (:301-308); lazy-reg
intervals G=density_reg_every / D=16; EMA kimg = batch*10/32 (:294); ADA
pipe config (:388-390); resume-time blur/gpc/ema-rampup disabling
(:394-401).
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


def parse_metric_list(s):
    if s is None or s in ('', 'none', 'None'):
        return []
    return [m.strip() for m in str(s).split(',') if m.strip()]


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
@click.option('--map-depth', 'map_depth', type=int, default=2)
@click.option('--mbstd-group', 'mbstd_group', type=int, default=4)
@click.option('--gen-pose-cond', type=bool, default=False)
@click.option('--gen-exp-cond', type=bool, default=False,
              help='expression labels via a second D mapping (reference '
                   'training_loop.py:162-176)')
@click.option('--gpc-reg-prob', type=float, default=0.5)
@click.option('--gpc-reg-fade-kimg', type=float, default=1000.0)
@click.option('--disc-c-noise', type=float, default=0.0)
@click.option('--density-reg', type=float, default=0.25)
@click.option('--density-reg-every', type=float, default=4)
@click.option('--density-reg-p-dist', type=float, default=0.004)
@click.option('--reg-type', type=click.Choice(
    ['l1', 'monotonic-detach', 'monotonic-fixed']), default='l1')
@click.option('--style-mixing-prob', type=float, default=0.0)
@click.option('--aug', type=click.Choice(['noaug', 'ada', 'fixed']),
              default='noaug')
@click.option('--target', 'ada_target', type=float, default=0.6)
@click.option('--p', 'aug_p', type=float, default=0.2,
              help='probability for --aug=fixed')
@click.option('--freezed', type=int, default=0,
              help='freeze first N layers of D')
@click.option('--mirror', type=bool, default=False,
              help='dataset x-flips (image-only, see dataset.py note)')
@click.option('--metrics', type=str, default='none',
              help='comma-separated metric names evaluated on snapshots, '
                   'or "none"')
@click.option('--workers', type=int, default=3,
              help='prefetch queue depth for the input pipeline')
@click.option('--resume', 'resume_path', type=str, default=None)
@click.option('--resume-blur', type=bool, default=False)
@click.option('--seed', type=int, default=0)
@click.option('--topology-path', type=str,
              default='/root/reference/data/demo/demo.obj')
@click.option('--eye-mask-path', type=str, default=None)
@click.option('--resolution', type=int, default=512)
@click.option('--sr-num-fp16-res', type=int, default=4)
@click.option('--sr-noise-mode', type=click.Choice(['random', 'none']),
              default='none')
@click.option('--neural-rendering-resolution-initial', type=int, default=64)
@click.option('--neural-rendering-resolution-final', type=int, default=None)
@click.option('--neural-rendering-resolution-fade-kimg', type=float,
              default=1000.0)
@click.option('--blur-fade-kimg', type=float, default=200.0)
@click.option('--cfg', type=click.Choice(['ffhq', 'afhq', 'shapenet']),
              default='ffhq',
              help='per-dataset rendering block: depth budget, ray range, '
                   'box_warp, camera stats (reference train_next3d.py'
                   ':330-360)')
@click.option('--model-version', 'model_version',
              type=click.Choice(['next3d', 'texture']), default='next3d',
              help='generator variant (reference --model_version; "texture" '
                   '= no mouth/blending nets, train_next3d.py:295)')
@click.option('--plane-resolution', type=int, default=256)
@click.option('--dataset-type', type=click.Choice(['image', 'video']),
              default='image',
              help='video = clip training with multi-frame discrimination '
                   '(reference train_next3d.py:116-119)')
@click.option('--num-frames-per-video', type=int, default=1,
              help='frames per clip; D sees them as stacked channels '
                   '(reference train_next3d.py:218, training_loop.py:172)')
@click.option('--max-num-frames', type=int, default=1024,
              help='cap on usable frames per clip (train_next3d.py:217)')
@click.option('--max-dist', type=int, default=32,
              help='temporal sampling window (train_next3d.py:216)')
@click.option('--sampling-type', 'sampling_type',
              type=click.Choice(['random', 'uniform', 'consecutive']),
              default='random')
@click.option('--dry-run', is_flag=True)
def main(**opts):
    train(**opts)


def train(outdir, data_path, num_devices=None, batch_size=32, r1_gamma=4.0,
          gen_exp_cond=False,
          total_kimg=25000, kimg_per_tick=4, snapshot_ticks=20, glr=0.0025,
          dlr=0.002, channel_base=32768, channel_max=512, map_depth=2,
          mbstd_group=4,
          gen_pose_cond=False, gpc_reg_prob=0.5, gpc_reg_fade_kimg=1000.0,
          disc_c_noise=0.0,
          density_reg=0.25, density_reg_every=4, density_reg_p_dist=0.004,
          reg_type='l1', style_mixing_prob=0.0,
          aug='noaug', ada_target=0.6, aug_p=0.2, freezed=0, mirror=False,
          metrics='none', workers=3,
          resume_path=None, resume_blur=False, seed=0,
          topology_path='/root/reference/data/demo/demo.obj',
          eye_mask_path=None, resolution=512, sr_num_fp16_res=4,
          sr_noise_mode='none',
          neural_rendering_resolution_initial=64,
          neural_rendering_resolution_final=None,
          neural_rendering_resolution_fade_kimg=1000.0,
          blur_fade_kimg=200.0,
          cfg='ffhq', model_version='next3d',
          plane_resolution=256, dataset_type='image',
          num_frames_per_video=1, max_num_frames=1024, max_dist=32,
          sampling_type='random', dry_run=False):
    import jax

    from ..data import ImageFolderDataset, make_data_iterator
    from ..models import TriPlaneGenerator
    from ..nn import DualDiscriminator
    from ..train import (LossConfig, StyleGAN2Loss, TrainStep, make_optimizer)
    from ..train.training_loop import training_loop

    from .common import CFG_RENDERING_BLOCKS
    rendering_kwargs = dict(FFHQ_RENDERING_KWARGS)
    rendering_kwargs.update(CFG_RENDERING_BLOCKS[cfg])
    rendering_kwargs.update(
        c_gen_conditioning_zero=not gen_pose_cond,
        gpc_reg_prob=gpc_reg_prob if gen_pose_cond else None,
        density_reg=density_reg,
        density_reg_p_dist=density_reg_p_dist,
        reg_type=reg_type,
        superresolution_module=choose_sr_module(resolution),
        superresolution_noise_mode=sr_noise_mode,
        image_resolution=resolution,
    )

    from ..models import TriPlaneTextureGenerator
    G_cls = {'next3d': TriPlaneGenerator,
             'texture': TriPlaneTextureGenerator}[model_version]
    G = G_cls(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=resolution,
        img_channels=3, topology_path=topology_path,
        uv_face_eye_mask_path=eye_mask_path,
        rendering_kwargs=rendering_kwargs, sr_num_fp16_res=sr_num_fp16_res,
        channel_base=channel_base, channel_max=channel_max,
        mapping_kwargs=dict(num_layers=map_depth),
        plane_resolution=plane_resolution)
    # video clips: D discriminates whole clips — frames stack on the channel
    # axis and per-frame camera labels concatenate (reference
    # training_loop.py:171-173: img_channels *= num_frames_per_video and the
    # conditioning dim doubles; run_D folds (B*T, ...) back to (B, T*C, ...))
    T = num_frames_per_video if dataset_type == 'video' else 1
    d_common = dict(img_resolution=resolution, img_channels=3 * T,
                    channel_base=channel_base, channel_max=channel_max,
                    block_kwargs=dict(freeze_layers=freezed),
                    epilogue_kwargs=dict(mbstd_group_size=mbstd_group),
                    disc_c_noise=disc_c_noise)
    if gen_exp_cond:
        from ..nn import DualLabelDualDiscriminator
        D = DualLabelDualDiscriminator(c_dim=25 * T, c2_dim=50 * T, **d_common)
    else:
        D = DualDiscriminator(c_dim=25 * T, **d_common)

    # resume-time schedule disabling (reference train_next3d.py:394-401)
    ada_kimg = 500
    ema_rampup = 0.05
    blur_init_sigma = 10.0 if blur_fade_kimg > 0 else 0.0
    if resume_path is not None:
        ada_kimg = 100  # make ADA react faster at the beginning
        ema_rampup = None  # disable EMA rampup
        if not resume_blur:
            blur_init_sigma = 0.0  # disable blur rampup
            gpc_reg_fade_kimg = 0.0  # disable swapping rampup

    augment_pipe = None
    if aug != 'noaug':
        from ..train.augment import AugmentPipe
        # reference pipe config (train_next3d.py:388)
        augment_pipe = AugmentPipe(
            xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1,
            brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)

    loss_cfg = LossConfig(
        r1_gamma=r1_gamma,
        gpc_reg_prob=gpc_reg_prob if gen_pose_cond else None,
        gpc_reg_fade_kimg=gpc_reg_fade_kimg,
        density_reg=density_reg,
        density_reg_p_dist=density_reg_p_dist,
        reg_type=reg_type,
        style_mixing_prob=style_mixing_prob,
        box_warp=rendering_kwargs.get('box_warp', 1.0),
        neural_rendering_resolution_initial=neural_rendering_resolution_initial,
        neural_rendering_resolution_final=neural_rendering_resolution_final,
        neural_rendering_resolution_fade_kimg=neural_rendering_resolution_fade_kimg,
        blur_init_sigma=blur_init_sigma,
        blur_fade_kimg=blur_fade_kimg * batch_size / 32,
        num_frames=T,
        dual_discrimination=True)
    from ..parallel import data_parallel_mesh
    loss_obj = StyleGAN2Loss(G, D, loss_cfg, augment_pipe=augment_pipe)
    devices = jax.devices()[:num_devices] if num_devices else None
    g_reg_interval = int(density_reg_every) if density_reg > 0 else None
    step = TrainStep(
        loss_obj,
        make_optimizer(glr, 0.0, 0.99, 1e-8, reg_interval=g_reg_interval),
        make_optimizer(dlr, 0.0, 0.99, 1e-8, reg_interval=16),
        mesh=data_parallel_mesh(devices))

    config = dict(outdir=outdir, data=data_path, batch=batch_size,
                  cfg=cfg, model_version=model_version,
                  gamma=r1_gamma, kimg=total_kimg, glr=glr, dlr=dlr,
                  aug=aug, ada_target=ada_target, aug_p=aug_p,
                  freezed=freezed, mirror=mirror,
                  metrics=parse_metric_list(metrics),
                  style_mixing_prob=style_mixing_prob, reg_type=reg_type,
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

    if dataset_type == 'video':
        from ..data.video_dataset import VideoFramesFolderDataset
        dataset = VideoFramesFolderDataset(
            data_path, resolution=resolution, num_frames=T,
            sampling=sampling_type, max_frame_dist=max_dist,
            max_num_frames=max_num_frames)
    else:
        dataset = ImageFolderDataset(data_path, resolution=resolution,
                                     xflip=mirror)
        dataset.prebake()
    # training-image observability (reference training_loop.py:277-282 builds
    # reals.png at setup; :428-435 saves fakes<kimg>.png/_raw from G_ema each
    # image-snapshot tick). Rank 0 only: grids are host-side IO.
    snapshot_vis_batch = None
    if jax.process_index() == 0:
        from .common import save_image_grid
        os.makedirs(outdir, exist_ok=True)
        vis_n = int(min(16, batch_size, len(dataset)))
        vis_rnd = np.random.RandomState(seed)
        idx = vis_rnd.choice(len(dataset), vis_n, replace=False)
        items = [dataset[int(i)] for i in idx]

        def _frame0(a, base_ndim):
            # video items carry a leading T axis; grid the first frame
            a = np.asarray(a)
            return a[0] if a.ndim == base_ndim + 1 else a
        reals = np.stack([_frame0(im, 3) for im, _, _ in items])
        save_image_grid(reals, os.path.join(outdir, 'reals.png'),
                        drange=(0, 255))
        snapshot_vis_batch = dict(
            gen_z=vis_rnd.randn(vis_n, 512).astype(np.float32),
            gen_c=np.stack([_frame0(c, 1) for _, c, _ in items]
                           ).astype(np.float32),
            gen_v=np.stack([_frame0(v, 2) for _, _, v in items]
                           ).astype(np.float32),
            nrr=neural_rendering_resolution_initial)

    # each host loads only ITS strided slice of the global batch
    # (reference analog: rank-strided InfiniteSampler, misc.py:139)
    assert batch_size % jax.process_count() == 0, \
        (batch_size, jax.process_count())
    it = make_data_iterator(dataset, batch_size // jax.process_count(),
                            rank=jax.process_index(),
                            num_replicas=jax.process_count(), seed=seed,
                            prefetch=workers)
    return training_loop(G, D, loss_obj, step, it, run_dir=outdir,
                         total_kimg=total_kimg, batch_size=batch_size,
                         ema_kimg=batch_size * 10 / 32,
                         ema_rampup=ema_rampup,
                         g_reg_interval=g_reg_interval,
                         kimg_per_tick=kimg_per_tick,
                         snapshot_ticks=snapshot_ticks,
                         image_snapshot_ticks=snapshot_ticks,
                         snapshot_vis_batch=snapshot_vis_batch,
                         resume_path=resume_path, seed=seed, config=config,
                         dataset=dataset,
                         ada_target=ada_target if aug == 'ada' else None,
                         augment_p=aug_p if aug == 'fixed' else 0.0,
                         ada_kimg=ada_kimg,
                         metrics=parse_metric_list(metrics))


if __name__ == '__main__':
    main()
