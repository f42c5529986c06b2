"""End-to-end training-loop smoke test: a few real optimizer steps over the
8-device CPU mesh on a toy dataset, including snapshot + exact resume."""

import json
import os

import numpy as np
import pytest

import jax

DEMO = "/root/reference/data/demo/demo.obj"


@pytest.fixture
def toy_face_dataset(tmp_path, rng):
    from PIL import Image
    from next3d_tpu.utils.obj_io import load_lms, load_obj_verts
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    root = tmp_path / "faces"
    (root / "images").mkdir(parents=True)
    (root / "meshes").mkdir()
    (root / "lms").mkdir()
    verts = load_obj_verts(DEMO)
    lms = load_lms("/root/reference/data/demo/demo_kpt2d.txt")
    import math
    from next3d_tpu.cli.common import camera_label
    c = camera_label(0, 0)[0]
    labels = []
    for i in range(8):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        name = f"images/{i:04d}.png"
        Image.fromarray(img).save(root / name)
        labels.append([name, c.tolist()])
        with open(root / f"meshes/{i:04d}.obj", "w") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        np.savetxt(root / f"lms/{i:04d}.txt", lms)
    with open(root / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(root)


def test_training_loop_runs_and_resumes(toy_face_dataset, tmp_path):
    from next3d_tpu.data import ImageFolderDataset, make_data_iterator
    from next3d_tpu.models import TriPlaneGenerator
    from next3d_tpu.nn import DualDiscriminator
    from next3d_tpu.parallel import data_parallel_mesh
    from next3d_tpu.train import (LossConfig, StyleGAN2Loss, TrainStep,
                                  make_optimizer)
    from next3d_tpu.train.training_loop import training_loop
    from next3d_tpu.utils.checkpoint import load_snapshot

    rk = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=6,
              depth_resolution_importance=6, disparity_space_sampling=False,
              clamp_mode='softplus', c_gen_conditioning_zero=True, c_scale=1.0,
              superresolution_module='SuperresolutionHybrid2X',
              superresolution_noise_mode='random', sr_antialias=True)
    G = TriPlaneGenerator(z_dim=16, c_dim=25, w_dim=512, img_resolution=128,
                          img_channels=3, topology_path=DEMO,
                          rendering_kwargs=rk, channel_base=512,
                          channel_max=32, plane_resolution=64,
                          rasterizer_patch=12, rasterizer_face_chunk=9976)
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=3,
                          channel_base=512, channel_max=32)
    from next3d_tpu.train.augment import AugmentPipe
    loss = StyleGAN2Loss(G, D, LossConfig(
        r1_gamma=1.0, gpc_reg_prob=None, density_reg=0.25,
        neural_rendering_resolution_initial=32),
        augment_pipe=AugmentPipe(xint=1, brightness=1))
    step = TrainStep(loss,
                     make_optimizer(0.0025, 0.0, 0.99, 1e-8, reg_interval=4),
                     make_optimizer(0.002, 0.0, 0.99, 1e-8, reg_interval=16),
                     mesh=data_parallel_mesh())

    ds = ImageFolderDataset(toy_face_dataset, resolution=64)
    # upscale images to 128 in the iterator via the model? keep simple:
    # re-make at model resolution by feeding 64 imgs is wrong; use 128 data.
    run_dir = str(tmp_path / "run")

    def it128():
        base = make_data_iterator(ds, batch_size_per_host=8, seed=1)
        from next3d_tpu.ops import interpolate_bilinear
        import jax.numpy as jnp
        for b in base:
            b['image'] = np.asarray(interpolate_bilinear(
                jnp.asarray(b['image']), 128))
            yield b

    state = training_loop(G, D, loss, step, it128(), run_dir=run_dir,
                          total_kimg=24 / 1000, batch_size=8,
                          kimg_per_tick=8 / 1000, snapshot_ticks=1,
                          image_snapshot_ticks=None, seed=0,
                          config={'G_kwargs': {}},
                          dataset=ds, ada_target=-2.0, ada_interval=1,
                          ada_kimg=0.001, timing_sample_every=1)
    assert state.cur_nimg == 24
    snaps = sorted(f for f in os.listdir(run_dir) if f.endswith('.pkl'))
    assert snaps, os.listdir(run_dir)
    stats = [json.loads(l) for l in open(os.path.join(run_dir, 'stats.jsonl'))]
    assert stats and 'Loss/G/loss' in stats[-1]
    assert np.isfinite(stats[-1]['Loss/G/loss'])
    # round-2 observability: per-phase timing + data fetch + ADA progress
    assert 'Timing/Gmain' in stats[-1] and stats[-1]['Timing/Gmain'] > 0
    assert 'Timing/data_fetch' in stats[-1]
    assert 'Progress/augment' in stats[-1]
    # target -2 < min possible sign mean (-1) forces sign(signs - target)
    # = +1 STRICTLY (at -1 a degenerate all-negative-logit D gives
    # sign(0) = 0 and p never moves): p must have grown
    assert stats[-1]['Progress/augment'] > 0.0

    # exact resume restores cur_nimg and params
    snap = load_snapshot(os.path.join(run_dir, snaps[-1]))
    assert snap['cur_nimg'] == 24
    assert snap['opt_state_G'] is not None
    assert 'ada_p' in (snap.get('extra') or {})
    w_saved = snap['params_G']['texture_backbone']['synthesis']['b4']['conv1']['weight']
    w_live = np.asarray(state.params_G['texture_backbone']['synthesis']['b4']['conv1']['weight'])
    np.testing.assert_array_equal(np.asarray(w_saved), w_live)
