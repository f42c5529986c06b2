"""Round-2 training features: ADA wiring, style mixing, density-reg
variants, D layer freezing, input-pipeline prefetch, full-dataset
conditioning sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DEMO = "/root/reference/data/demo/demo.obj"


def _tiny_gd(img_resolution=128, d_resolution=64, nrr=16):
    """Tiny G + D pair (no superresolution cost beyond 2X)."""
    from next3d_tpu.models import TriPlaneGenerator
    from next3d_tpu.nn import DualDiscriminator
    rk = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=4,
              depth_resolution_importance=4, disparity_space_sampling=False,
              clamp_mode='softplus', c_gen_conditioning_zero=True,
              c_scale=1.0, superresolution_module='SuperresolutionHybrid2X',
              superresolution_noise_mode='random', sr_antialias=True)
    G = TriPlaneGenerator(z_dim=8, c_dim=25, w_dim=512,
                          img_resolution=img_resolution, img_channels=3,
                          topology_path=DEMO, rendering_kwargs=rk,
                          channel_base=512, channel_max=32,
                          plane_resolution=64, rasterizer_patch=12,
                          rasterizer_face_chunk=9976)
    D = DualDiscriminator(c_dim=25, img_resolution=d_resolution,
                          img_channels=3, channel_base=512, channel_max=32)
    return G, D


def _batch(rng, G, n=2):
    from next3d_tpu.cli.common import camera_label
    from next3d_tpu.utils.obj_io import load_lms, load_obj
    mesh = load_obj(DEMO)
    lms = load_lms("/root/reference/data/demo/demo_kpt2d.txt")
    v = np.concatenate([mesh.verts, lms], 0)[None].repeat(n, 0)
    c = camera_label(0, 0).repeat(n, 0)
    return {'gen_z': rng.randn(n, G.z_dim).astype(np.float32),
            'gen_c': c.astype(np.float32),
            'gen_v': v.astype(np.float32),
            'real_c': c.astype(np.float32)}


class _SpyPipe:
    """Records the p it was called with; shifts images by a constant so the
    effect is unmistakable in the logits."""

    def __init__(self):
        self.calls = []

    def __call__(self, rng, images, p):
        self.calls.append(p)
        return images + 100.0


def test_run_d_applies_augmentation(rng):
    """run_D must route the concatenated (image, upsampled raw) pair through
    augment_pipe with sched['aug_p'] (reference loss.py:81-86)."""
    from next3d_tpu.train import LossConfig, StyleGAN2Loss
    G, D = _tiny_gd()
    pipe = _SpyPipe()
    loss = StyleGAN2Loss(G, D, LossConfig(), augment_pipe=pipe)
    loss_noaug = StyleGAN2Loss(G, D, LossConfig(), augment_pipe=None)
    params_D = D.init(jax.random.PRNGKey(0))
    img = {'image': jnp.asarray(rng.randn(2, 3, 64, 64), jnp.float32),
           'image_raw': jnp.asarray(rng.randn(2, 3, 16, 16), jnp.float32)}
    c = jnp.asarray(_batch(rng, G)['gen_c'])
    k = jax.random.PRNGKey(1)

    sched = dict(blur_sigma=0.0, swapping_prob=-1.0, aug_p=0.7)
    l_ref = loss_noaug.run_D(params_D, img, c, k, sched)
    l_aug = loss.run_D(params_D, img, c, k, sched)
    assert pipe.calls and float(pipe.calls[0]) == pytest.approx(0.7)
    d = float(np.max(np.abs(np.asarray(l_aug) - np.asarray(l_ref))))
    assert d > 1.0, d


def test_run_d_augmented_real_pipeline(rng):
    """End-to-end with the real AugmentPipe: p=1 transformed inputs stay
    finite and the graph differentiates (as used by Dmain/Dreg)."""
    from next3d_tpu.train import LossConfig, StyleGAN2Loss
    from next3d_tpu.train.augment import AugmentPipe
    G, D = _tiny_gd()
    pipe = AugmentPipe(rotate90=1, xint=1, brightness=1)
    loss = StyleGAN2Loss(G, D, LossConfig(), augment_pipe=pipe)
    params_D = D.init(jax.random.PRNGKey(0))
    img = {'image': jnp.asarray(rng.randn(2, 3, 64, 64), jnp.float32),
           'image_raw': jnp.asarray(rng.randn(2, 3, 16, 16), jnp.float32)}
    c = jnp.asarray(_batch(rng, G)['gen_c'])
    sched = dict(blur_sigma=0.0, swapping_prob=-1.0, aug_p=1.0)

    def f(image):
        return jnp.sum(loss.run_D(params_D,
                                  {'image': image,
                                   'image_raw': img['image_raw']},
                                  c, jax.random.PRNGKey(1), sched))

    val, g = jax.value_and_grad(f)(img['image'])
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.sum(jnp.abs(g))) > 0


def test_style_mixing_replaces_tail(rng):
    """prob=1 forces a cutoff draw: all ws rows >= cutoff come from the
    second mapping; row 0 always keeps the first draw (cutoff >= 1)."""
    from next3d_tpu.train import LossConfig, StyleGAN2Loss
    G, D = _tiny_gd()
    cfg = LossConfig(style_mixing_prob=1.0)
    loss = StyleGAN2Loss(G, D, cfg)
    params_G = G.init(jax.random.PRNGKey(0))
    b = _batch(rng, G)
    z = jnp.asarray(b['gen_z'])
    c = jnp.asarray(b['gen_c'])
    ws, _ = G.mapping(params_G, z, c, return_w_mean=True)
    mixed = loss._style_mixing(params_G, ws, z, c, jax.random.PRNGKey(3))
    ws = np.asarray(ws)
    mixed = np.asarray(mixed)
    assert np.array_equal(mixed[:, 0], ws[:, 0])
    changed = [t for t in range(ws.shape[1])
               if not np.array_equal(mixed[:, t], ws[:, t])]
    assert changed, "no rows mixed at prob=1"
    # replaced rows are a contiguous tail
    assert changed == list(range(min(changed), ws.shape[1]))


@pytest.mark.parametrize('reg_type', ['monotonic-detach', 'monotonic-fixed'])
def test_monotonic_density_reg(rng, reg_type):
    from next3d_tpu.train import LossConfig, StyleGAN2Loss
    G, D = _tiny_gd()
    cfg = LossConfig(reg_type=reg_type, density_reg=0.25, gpc_reg_prob=None)
    loss = StyleGAN2Loss(G, D, cfg)
    params_G = G.init(jax.random.PRNGKey(0))
    b = {k: jnp.asarray(v) for k, v in _batch(rng, G).items()}
    sched = dict(blur_sigma=0.0, swapping_prob=-1.0, aug_p=0.0)

    def f(p):
        l, _ = loss.greg_loss(p, b, jax.random.PRNGKey(5), sched)
        return l

    val, grads = jax.value_and_grad(f)(params_G)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_freezed_discriminator_layers():
    """--freezed N: the first N D layers produce a False trainable mask and
    never move under optimizer updates."""
    from next3d_tpu.nn import DualDiscriminator
    from next3d_tpu.train.train_step import trainable_mask
    D = DualDiscriminator(c_dim=25, img_resolution=64, img_channels=3,
                          channel_base=512, channel_max=32,
                          block_kwargs=dict(freeze_layers=2))
    frozen = D.frozen_paths()
    assert frozen, "freeze_layers=2 must freeze at least one conv"
    params = D.init(jax.random.PRNGKey(0))
    mask = trainable_mask(params, frozen)
    import jax as _jax
    flat = _jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen_leaves = [p for p, m in flat if not m]
    assert frozen_leaves
    for path, m in flat:
        names = tuple(k.key for k in path)
        in_frozen = any(names[:len(fp)] == tuple(fp) for fp in frozen)
        assert m == (not in_frozen)


def test_prefetch_iterator_yields_same_batches():
    from next3d_tpu.data.dataset import PrefetchIterator

    def gen():
        for i in range(5):
            yield {'i': i}

    it = PrefetchIterator(gen(), depth=2)
    got = [next(it)['i'] for _ in range(5)]
    assert got == list(range(5))
    it.close()


def test_sample_conditioning_covers_dataset(tmp_path):
    """sample_conditioning draws labels beyond any single batch."""
    import json
    import os
    from PIL import Image
    from next3d_tpu.data import ImageFolderDataset
    from next3d_tpu.utils.obj_io import load_lms, load_obj_verts
    if not os.path.exists(DEMO):
        pytest.skip("demo mesh absent")
    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "meshes").mkdir()
    (root / "lms").mkdir()
    verts = load_obj_verts(DEMO)
    lms = load_lms("/root/reference/data/demo/demo_kpt2d.txt")
    labels = []
    for i in range(6):
        name = f"images/{i:04d}.png"
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(root / name)
        labels.append([name, (np.arange(25, dtype=np.float32) + i).tolist()])
        with open(root / f"meshes/{i:04d}.obj", "w") as f:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        np.savetxt(root / f"lms/{i:04d}.txt", lms)
    with open(root / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    ds = ImageFolderDataset(str(root), resolution=32)
    ds.prebake()
    rnd = np.random.RandomState(0)
    c, v = ds.sample_conditioning(rnd, 64)
    assert c.shape == (64, 25) and v.shape[0] == 64
    # identity of the drawn item is encoded in c[:, 0]; with 64 draws over 6
    # items we should see >4 distinct identities
    assert len(np.unique(c[:, 0])) > 4
