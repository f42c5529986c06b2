"""Equivariance metrics: operator goldens vs the reference + end-to-end on
a tiny SG3 generator (metrics/equivariance.py)."""

import numpy as np
import pytest

import jax

from next3d_tpu.metrics.equivariance import (
    apply_fractional_pseudo_rotation,
    apply_fractional_rotation,
    apply_fractional_translation,
    apply_integer_translation,
    compute_equivariance_metrics,
    construct_affine_bandlimit_filter,
    rotation_matrix,
)

from ref_oracle import import_reference


def _ref_eq():
    import_reference()
    import importlib
    return importlib.import_module('metrics.equivariance')


def test_integer_translation_matches(rng):
    ref = _ref_eq()
    import torch
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    for t in ((0.25, -0.125), (0.0, 0.0), (0.9, 0.2)):
        zw, mw = ref.apply_integer_translation(torch.as_tensor(x), t[0], t[1])
        z, m = apply_integer_translation(x, t[0], t[1])
        np.testing.assert_allclose(z, zw.numpy(), atol=1e-7)
        np.testing.assert_allclose(m, mw.numpy(), atol=0)


def test_fractional_translation_matches(rng):
    ref = _ref_eq()
    import torch
    x = rng.randn(2, 3, 24, 24).astype(np.float32)
    for t in ((0.1,  -0.07), (0.33, 0.41)):
        zw, mw = ref.apply_fractional_translation(torch.as_tensor(x),
                                                  t[0], t[1])
        z, m = apply_fractional_translation(x, t[0], t[1])
        np.testing.assert_allclose(z, zw.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(m, mw.numpy(), atol=0)


def test_bandlimit_filter_matches():
    ref = _ref_eq()
    for angle in (0.3, -1.1):
        want = ref.construct_affine_bandlimit_filter(
            ref.rotation_matrix(angle), a=3, amax=6, up=4).numpy()
        got = construct_affine_bandlimit_filter(rotation_matrix(angle),
                                                a=3, amax=6, up=4)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_rotation_operators_match(rng):
    ref = _ref_eq()
    import torch
    x = rng.randn(1, 2, 32, 32).astype(np.float32)
    angle = 0.45
    zw, mw = ref.apply_fractional_rotation(torch.as_tensor(x), angle)
    z, m = apply_fractional_rotation(x, angle)
    np.testing.assert_allclose(z, zw.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(m, mw.numpy(), atol=1e-5)
    zw, mw = ref.apply_fractional_pseudo_rotation(torch.as_tensor(x), angle)
    z, m = apply_fractional_pseudo_rotation(x, angle)
    np.testing.assert_allclose(z, zw.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(m, mw, atol=0)


def test_equivariance_end_to_end_sg3():
    from next3d_tpu.metrics.metric_utils import MetricOptions
    from next3d_tpu.nn import SG3Generator
    G = SG3Generator(z_dim=8, c_dim=0, w_dim=8, img_resolution=32,
                     img_channels=3, channel_base=1024, channel_max=32,
                     num_layers=4, num_critical=2, num_fp16_res=0)
    params = G.init(jax.random.PRNGKey(0))
    opts = MetricOptions(generator=G, params=params, seed=1)
    psnrs = [compute_equivariance_metrics(opts, num_samples=8, batch_size=4,
                                          **{flag: True})
             for flag in ('compute_eqt_int', 'compute_eqt_frac',
                          'compute_eqr')]
    for p in psnrs:
        assert np.isfinite(p), psnrs
    # an alias-free net is approximately translation-equivariant even at
    # random init: integer-translation PSNR should comfortably beat a
    # totally non-equivariant baseline (~10 dB for unrelated images)
    assert psnrs[0] > 12, psnrs


def test_equivariance_rejects_non_sg3():
    from next3d_tpu.metrics.metric_utils import MetricOptions
    from next3d_tpu.nn import Generator
    G = Generator(z_dim=8, c_dim=0, w_dim=8, img_resolution=16,
                  img_channels=3, channel_base=1024, channel_max=32)
    opts = MetricOptions(generator=G, params=G.init(jax.random.PRNGKey(0)))
    with pytest.raises(ValueError):
        compute_equivariance_metrics(opts, num_samples=4, batch_size=2,
                                     compute_eqt_int=True)
