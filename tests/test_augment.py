"""ADA pipeline tests: identity behavior, forced-transform semantics, and
geometric-resampling parity vs the reference pipe on torch-CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.train.augment import AugmentPipe, ada_update_p

from ref_oracle import import_reference

ADA_KW = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
              xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
              saturation=1)


def test_p_zero_geometry_matches_reference(rng):
    """With p=0 the geometric machinery still executes with identity
    transforms (reference augment.py:277); outputs must match the reference's
    wavelet up->sample->down roundtrip away from borders."""
    import_reference()
    import torch
    from training_avatar_texture import augment as ref_aug

    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    ref_pipe = ref_aug.AugmentPipe(**ADA_KW)
    ref_pipe.p.copy_(torch.zeros([]))
    want = ref_pipe(torch.as_tensor(x)).numpy()

    pipe = AugmentPipe(**ADA_KW)
    got = np.asarray(pipe(jax.random.PRNGKey(0), jnp.asarray(x), p=0.0))
    # border rows/cols differ (reflect-pad vs reflect-coords deviation)
    m = 4
    np.testing.assert_allclose(got[:, :, m:-m, m:-m], want[:, :, m:-m, m:-m],
                               rtol=1e-3, atol=1e-3)


def test_p_one_changes_images(rng):
    x = rng.randn(4, 3, 32, 32).astype(np.float32)
    pipe = AugmentPipe(**ADA_KW)
    out = np.asarray(pipe(jax.random.PRNGKey(1), jnp.asarray(x), p=1.0))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert np.abs(out - x).max() > 0.1  # something actually happened


def test_color_only_brightness(rng):
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    pipe = AugmentPipe(brightness=1, brightness_std=0.2)
    out = np.asarray(pipe(jax.random.PRNGKey(2), jnp.asarray(x), p=1.0))
    # brightness is a per-sample constant offset
    d = out - x
    for b in range(2):
        np.testing.assert_allclose(d[b], d[b].flat[0], atol=1e-5)


def test_six_channel_dual_input(rng):
    """ADA runs on the concatenated 6-channel dual-D input (loss.py:82-86)."""
    x = rng.randn(2, 6, 16, 16).astype(np.float32)
    pipe = AugmentPipe(**ADA_KW)
    out = np.asarray(pipe(jax.random.PRNGKey(3), jnp.asarray(x), p=0.5))
    assert out.shape == x.shape and np.isfinite(out).all()


def test_ada_p_controller():
    p = ada_update_p(0.5, real_signs_mean=0.9, ada_target=0.6,
                     nimg_delta=4000, ada_kimg=500)
    assert p > 0.5
    p = ada_update_p(0.5, real_signs_mean=0.1, ada_target=0.6,
                     nimg_delta=4000, ada_kimg=500)
    assert p < 0.5
    assert ada_update_p(0.0, -1, 0.6, 10**9) == 0.0
