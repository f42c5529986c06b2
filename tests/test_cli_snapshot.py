"""Inference CLIs driven end-to-end through a SAVED snapshot: save a tiny
flagship generator with save_snapshot, then run gen-samples and gen-videos
through load_any_generator -> build_generator_from_kwargs — the full
snapshot->CLI surface a reference user would exercise
(gen_samples_next3d.py:147-157, gen_videos_next3d.py)."""

import glob
import os

import numpy as np

import jax

from next3d_tpu.models import TriPlaneGenerator
from next3d_tpu.utils.checkpoint import save_snapshot

DEMO = "/root/reference/data/demo"
G_KWARGS = dict(
    z_dim=64, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
    channel_base=2048, channel_max=64,
    rendering_kwargs=dict(
        ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=8,
        depth_resolution_importance=8, disparity_space_sampling=False,
        clamp_mode='softplus', c_gen_conditioning_zero=True, c_scale=1.0,
        superresolution_module='SuperresolutionHybrid2X',
        superresolution_noise_mode='none', sr_antialias=True))


def test_gen_samples_and_videos_from_snapshot(tmp_path):
    G = TriPlaneGenerator(topology_path=f"{DEMO}/demo.obj", **G_KWARGS)
    params = G.init(jax.random.PRNGKey(0))
    snap = str(tmp_path / "snapshot.pkl")
    save_snapshot(snap, params_G_ema=params,
                  config={'G_kwargs': dict(G_KWARGS)})

    from next3d_tpu.cli.gen_samples import generate_images
    out1 = str(tmp_path / "samples")
    generate_images(snap, seeds=[0], outdir=out1, shapes=True, shape_res=32,
                    max_batch=16384, obj_path=f"{DEMO}/demo.obj",
                    lms_path=f"{DEMO}/demo_kpt2d.txt")
    pngs = glob.glob(os.path.join(out1, "*.png"))
    mrcs = glob.glob(os.path.join(out1, "*.mrc"))
    assert len(pngs) == 1 and len(mrcs) == 1
    assert os.path.getsize(pngs[0]) > 1000
    assert os.path.getsize(mrcs[0]) > 32 ** 3  # voxels + header

    from next3d_tpu.cli.gen_videos import generate_video
    out2 = str(tmp_path / "video")
    generate_video(snap, seeds=[0, 1, 2, 3], grid='2x2', outdir=out2,
                   w_frames=2, fps=10, obj_path=f"{DEMO}/demo.obj",
                   lms_path=f"{DEMO}/demo_kpt2d.txt")
    vids = glob.glob(os.path.join(out2, "*"))
    assert vids and sum(os.path.getsize(v) for v in vids
                        if os.path.isfile(v)) > 1000


def test_reenact_from_snapshot(tmp_path):
    """reenact CLI end-to-end: snapshot + synthesized 3-frame driving dir
    (dataset.json + per-frame .obj/.kpt2d, reference README.md:76-83)."""
    import json
    import shutil

    G = TriPlaneGenerator(topology_path=f"{DEMO}/demo.obj", **G_KWARGS)
    params = G.init(jax.random.PRNGKey(1))
    snap = str(tmp_path / "snapshot.pkl")
    save_snapshot(snap, params_G_ema=params,
                  config={'G_kwargs': dict(G_KWARGS)})

    drive = tmp_path / "drive"
    drive.mkdir()
    from next3d_tpu.cli.common import camera_label
    labels = []
    lms = np.loadtxt(f"{DEMO}/demo_kpt2d.txt")
    for i in range(3):
        stem = f"frame{i:03d}"
        shutil.copy(f"{DEMO}/demo.obj", drive / f"{stem}.obj")
        np.savetxt(drive / f"{stem}_kpt2d.txt", lms + 0.01 * i)
        labels.append([f"{stem}.png",
                       camera_label(0.05 * i, 0.0)[0].tolist()])
    with open(drive / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)

    from next3d_tpu.cli.reenact import reenact
    out = str(tmp_path / "reenact_out")
    reenact(snap, str(drive), seeds=[0], outdir=out,
            topology_path=f"{DEMO}/demo.obj")
    made = [p for p in os.listdir(out)]
    assert made, "reenact produced no output"
