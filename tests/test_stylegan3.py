"""StyleGAN3 alias-free nets: parity vs the reference on torch-CPU with
transferred weights (networks_stylegan3.py:27-517)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.nn import SG3Generator, SynthesisInput, design_lowpass_filter
from next3d_tpu.utils.pkl_import import state_dict_to_params

from ref_oracle import import_reference, torch_state_dict_numpy

TINY = dict(channel_base=1024, channel_max=64, num_layers=6, num_critical=2,
            num_fp16_res=0)


def _ref():
    import_reference()
    from training_avatar_texture import networks_stylegan3 as ref
    return ref


def test_lowpass_filter_matches_reference():
    ref = _ref()
    for numtaps, cutoff, width, fs, radial in (
            (12, 2.0, 1.5, 16, False), (24, 6.0, 3.0, 64, False),
            (12, 8.0, 5.0, 32, True), (1, 2.0, 1.0, 4, False)):
        want = ref.SynthesisLayer.design_lowpass_filter(
            numtaps, cutoff, width, fs, radial=radial)
        got = design_lowpass_filter(numtaps, cutoff, width, fs,
                                    radial=radial)
        if want is None:
            assert got is None
        else:
            np.testing.assert_allclose(got, want.numpy(), rtol=1e-5,
                                       atol=1e-7)


def test_synthesis_input_matches_reference(rng):
    ref = _ref()
    import torch
    torch.manual_seed(0)
    ri = ref.SynthesisInput(w_dim=16, channels=32, size=20, sampling_rate=16,
                            bandwidth=2)
    ours = SynthesisInput(w_dim=16, channels=32, size=20, sampling_rate=16,
                          bandwidth=2)
    params = state_dict_to_params(torch_state_dict_numpy(ri))
    w = rng.randn(3, 16).astype(np.float32)
    want = ri(torch.as_tensor(w)).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sg3_generator_matches_reference(rng):
    ref = _ref()
    import torch
    torch.manual_seed(1)
    rg = ref.Generator(z_dim=16, c_dim=8, w_dim=16, img_resolution=32,
                       img_channels=3, **TINY)
    g = SG3Generator(z_dim=16, c_dim=8, w_dim=16, img_resolution=32,
                     img_channels=3, **TINY)
    assert g.num_ws == rg.num_ws
    params = state_dict_to_params(torch_state_dict_numpy(rg))
    z = rng.randn(2, 16).astype(np.float32)
    c = rng.randn(2, 8).astype(np.float32)
    want = rg(torch.as_tensor(z), torch.as_tensor(c),
              force_fp32=True).detach().numpy()
    got = np.asarray(g(params, jnp.asarray(z), jnp.asarray(c),
                       force_fp32=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_filtered_lrelu_matches_reference(rng):
    """Golden vs the reference composition `_filtered_lrelu_ref`
    (filtered_lrelu.py:123-150) incl. negative paddings as SG3 emits."""
    _ref()
    import torch
    from torch_utils.ops import filtered_lrelu as ref_fl

    from next3d_tpu.ops.filtered_lrelu import filtered_lrelu
    from next3d_tpu.ops.upfirdn2d import setup_filter

    fu = np.asarray(design_lowpass_filter(8, 2.0, 1.5, 8), np.float32)
    fd = np.asarray(design_lowpass_filter(12, 3.0, 2.0, 16), np.float32)
    x = rng.randn(2, 4, 21, 24).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    for up, down, padding in ((2, 2, [3, 2, -1, 4]), (1, 1, 0),
                              (2, 1, [1, 0, 2, 1]), (1, 2, 5)):
        want = ref_fl._filtered_lrelu_ref(
            torch.as_tensor(x), fu=torch.as_tensor(fu),
            fd=torch.as_tensor(fd), b=torch.as_tensor(b), up=up, down=down,
            padding=padding, gain=np.sqrt(2), slope=0.2,
            clamp=10.0).numpy()
        got = np.asarray(filtered_lrelu(
            jnp.asarray(x), fu=setup_filter(fu, normalize=False),
            fd=setup_filter(fd, normalize=False), b=jnp.asarray(b), up=up,
            down=down, padding=padding, gain=np.sqrt(2), slope=0.2,
            clamp=10.0))
        assert got.shape == want.shape, (up, down, padding, got.shape,
                                         want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sg3_truncation_and_grad(rng):
    g = SG3Generator(z_dim=8, c_dim=0, w_dim=8, img_resolution=32,
                     img_channels=3, **TINY)
    params = g.init(jax.random.PRNGKey(0))
    z = jnp.asarray(rng.randn(2, 8).astype(np.float32))

    def loss(p):
        return jnp.mean(jnp.square(g(p, z, truncation_psi=0.7)))

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gnorm = jax.tree.reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))),
                            grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
