"""Video-clip GAN training end-to-end: VideoFramesFolderDataset -> cli.train
-> 4-phase step on the 8-device mesh with multi-frame discrimination.

Behavioral spec: reference train_next3d.py:116-119 (video dataset
construction), :216-218 (--max-dist/--max-num-frames/--num-frames-per-video),
:379 (loss num_frames); training_avatar_texture/training_loop.py:171-173
(D img_channels *= T), :323-333 (per-video gen conditioning);
training_avatar_texture/loss.py:88-108 (clip flattening + channel folding)."""

import json
import os

import numpy as np
import pytest

DEMO = "/root/reference/data/demo/demo.obj"


# --------------------------------------------------------------- sampling
def test_sample_frames_modes(rng):
    from next3d_tpu.data.video_dataset import sample_frames
    for sampling in ("random", "uniform", "consecutive"):
        sel = sample_frames(10, num_frames=3, sampling=sampling,
                            max_frame_dist=5, rng=rng)
        assert sel.shape == (3,)
        assert (sel >= 0).all() and (sel < 10).all()
        if sampling != "consecutive":
            # window constraint: spread bounded by max_frame_dist
            assert sel.max() - sel.min() < 5
    # single frame: plain random index
    sel = sample_frames(10, num_frames=1, rng=rng)
    assert sel.shape == (1,)
    # degenerate clip shorter than num_frames still yields num_frames indices
    sel = sample_frames(2, num_frames=4, sampling="random",
                        max_frame_dist=30, rng=rng)
    assert sel.shape == (4,) and (sel < 2).all()


# ---------------------------------------------------------------- fixture
@pytest.fixture
def toy_video_dataset(tmp_path, rng):
    from PIL import Image
    from next3d_tpu.cli.common import camera_label
    from next3d_tpu.utils.obj_io import load_lms, load_obj_verts
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    root = tmp_path / "clips"
    root.mkdir()
    verts = load_obj_verts(DEMO)
    lms = load_lms("/root/reference/data/demo/demo_kpt2d.txt")
    labels = []
    for ci in range(3):
        clip = f"clip{ci}"
        (root / clip).mkdir()
        (root / "meshes" / clip).mkdir(parents=True)
        (root / "lms" / clip).mkdir(parents=True)
        for fi in range(5):
            img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
            name = f"{fi:04d}.png"
            Image.fromarray(img).save(root / clip / name)
            c = camera_label(0.1 * fi, 0)[0]
            labels.append([f"{clip}/{name}", c.tolist()])
            with open(root / "meshes" / clip / f"{fi:04d}.obj", "w") as f:
                for v in verts:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
            np.savetxt(root / "lms" / clip / f"{fi:04d}.txt", lms)
    with open(root / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(root)


# ----------------------------------------------------------------- dataset
def test_video_dataset_shapes(toy_video_dataset, rng):
    from next3d_tpu.data.video_dataset import VideoFramesFolderDataset
    ds = VideoFramesFolderDataset(toy_video_dataset, num_frames=2,
                                  sampling="random", max_frame_dist=4)
    assert len(ds) == 3
    assert ds.resolution == 128  # inferred from the first frame
    img, c, v = ds[0]
    assert img.shape == (2, 3, 128, 128) and img.dtype == np.uint8
    assert c.shape == (2, 25)
    assert v.shape == (2, 5091, 3)
    # per-video conditioning draws (reference training_loop.py:323-333)
    c2, v2 = ds.sample_conditioning(rng, 4)
    assert c2.shape == (4, 2, 25) and v2.shape == (4, 2, 5091, 3)
    assert ds.get_label_std().shape == (25,)


def test_video_dataset_max_num_frames_cap(toy_video_dataset):
    from next3d_tpu.data.video_dataset import VideoFramesFolderDataset
    ds = VideoFramesFolderDataset(toy_video_dataset, num_frames=2,
                                  sampling="consecutive", max_frame_dist=30,
                                  max_num_frames=2, seed=1)
    # cap=2: only frames {0,1} are ever usable
    for _ in range(8):
        _, c, _ = ds[0]
    assert ds._clip_len(0) == 2
    sel_max = 0
    for _ in range(16):
        from next3d_tpu.data.video_dataset import sample_frames
        sel = sample_frames(ds._clip_len(0), 2, "consecutive", 30,
                            rng=np.random.RandomState(0))
        sel_max = max(sel_max, int(sel.max()))
    assert sel_max <= 1


def test_video_batch_iterator(toy_video_dataset):
    from next3d_tpu.data import make_data_iterator
    from next3d_tpu.data.video_dataset import VideoFramesFolderDataset
    ds = VideoFramesFolderDataset(toy_video_dataset, num_frames=2)
    it = make_data_iterator(ds, 4, prefetch=0)
    b = next(it)
    assert b["image"].shape == (4, 2, 3, 128, 128)
    assert b["image"].min() >= -1.0 and b["image"].max() <= 1.0
    assert b["c"].shape == (4, 2, 25)
    assert b["v"].shape == (4, 2, 5091, 3)


# -------------------------------------------------------------------- e2e
def test_video_training_e2e_through_cli(toy_video_dataset, tmp_path):
    """One full 4-phase training step (Gmain+Greg+Dmain+Dreg) on the
    8-device mesh with T=2 clips, through cli.train.train() itself."""
    from next3d_tpu.cli.train import train
    run_dir = str(tmp_path / "run")
    train(outdir=run_dir, data_path=toy_video_dataset,
          dataset_type="video", num_frames_per_video=2, max_num_frames=4,
          max_dist=3, sampling_type="random",
          batch_size=8, total_kimg=8 / 1000, kimg_per_tick=8 / 1000,
          snapshot_ticks=None if False else 20,
          channel_base=512, channel_max=32, map_depth=2, mbstd_group=1,
          resolution=128, plane_resolution=64,
          neural_rendering_resolution_initial=16,
          blur_fade_kimg=0.0, aug="noaug", metrics="none", workers=0,
          sr_num_fp16_res=0)
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        records = [json.loads(l) for l in f if l.strip()]
    assert records, "no stats written"
    last = records[-1]
    for k in ("Loss/G/loss", "Loss/D/loss", "Loss/G/reg", "Loss/r1_penalty"):
        assert k in last and np.isfinite(last[k]), (k, last.get(k))
    # D was built for folded clips: 6 input channels, 50-dim conditioning
    opts = json.load(open(os.path.join(run_dir, "training_options.json")))
    assert opts["data"] == toy_video_dataset
    # image observability wired end-to-end (reference training_loop.py
    # :277-282 reals grid at setup, :428-435 fakes grids per snapshot tick)
    assert os.path.exists(os.path.join(run_dir, "reals.png"))
    fakes = [f for f in os.listdir(run_dir) if f.startswith("fakes")]
    assert any(f.endswith("_raw.png") for f in fakes), os.listdir(run_dir)
    assert any(f.endswith(".png") and not f.endswith("_raw.png")
               for f in fakes), os.listdir(run_dir)
