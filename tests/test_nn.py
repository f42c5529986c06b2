"""Module-level parity tests: our JAX modules vs the reference torch modules
run on CPU, with weights transferred through the state_dict importer — this
doubles as the checkpoint-import test (SURVEY.md section 4, items 1-2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.nn import (
    CondGenerator,
    DualDiscriminator,
    Generator,
    MappingNetwork,
    SuperresolutionHybrid8XDC,
)
from next3d_tpu.utils.pkl_import import state_dict_to_params

from ref_oracle import import_reference, torch_state_dict_numpy

SMALL = dict(channel_base=2048, channel_max=128)


def test_generator_matches_reference_cpu(rng):
    import_reference()
    import torch
    from training_avatar_texture import networks_stylegan2 as ref

    torch.manual_seed(0)
    rg = ref.Generator(z_dim=64, c_dim=12, w_dim=64, img_resolution=32,
                       img_channels=8, **SMALL)
    g = Generator(z_dim=64, c_dim=12, w_dim=64, img_resolution=32,
                  img_channels=8, **SMALL)
    assert g.num_ws == rg.num_ws

    params = state_dict_to_params(torch_state_dict_numpy(rg))
    z = rng.randn(3, 64).astype(np.float32)
    c = rng.randn(3, 12).astype(np.float32)

    want = rg(torch.as_tensor(z), torch.as_tensor(c), noise_mode='const',
              force_fp32=True).detach().numpy()
    got = np.asarray(g(params, jnp.asarray(z), jnp.asarray(c),
                       noise_mode='const', force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_generator_truncation_matches(rng):
    import_reference()
    import torch
    from training_avatar_texture import networks_stylegan2 as ref

    torch.manual_seed(1)
    rg = ref.Generator(z_dim=32, c_dim=0, w_dim=32, img_resolution=16,
                       img_channels=4, **SMALL)
    with torch.no_grad():
        rg.mapping.w_avg.copy_(torch.randn(32))
    g = Generator(z_dim=32, c_dim=0, w_dim=32, img_resolution=16,
                  img_channels=4, **SMALL)
    params = state_dict_to_params(torch_state_dict_numpy(rg))

    z = rng.randn(2, 32).astype(np.float32)
    want = rg.mapping(torch.as_tensor(z), None, truncation_psi=0.7,
                      truncation_cutoff=3).detach().numpy()
    got = np.asarray(g.mapping(params['mapping'], jnp.asarray(z), None,
                               truncation_psi=0.7, truncation_cutoff=3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_styleunet_matches_reference_cpu(rng):
    import_reference()
    import torch
    from training_avatar_texture import networks_stylegan2_styleunet as ref

    torch.manual_seed(2)
    # mouth-backbone-shaped config, scaled down (in 16 -> out 64, final 4)
    kw = dict(z_dim=32, c_dim=0, w_dim=32, img_resolution=64, img_channels=8,
              in_size=16, final_size=4, cond_channels=8, num_cond_res=16,
              **SMALL)
    rg = ref.Generator(**kw)
    g = CondGenerator(**kw)
    assert g.num_ws == rg.num_ws

    params = state_dict_to_params(torch_state_dict_numpy(rg))
    x_in = rng.randn(2, 8, 16, 16).astype(np.float32)
    ws = rng.randn(2, rg.num_ws, 32).astype(np.float32)

    want = rg.synthesis(torch.as_tensor(x_in), torch.as_tensor(ws),
                        noise_mode='const', force_fp32=True).detach().numpy()
    got = np.asarray(g.synthesis(params['synthesis'], jnp.asarray(x_in),
                                 jnp.asarray(ws), noise_mode='const',
                                 force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_superresolution_8xdc_matches_reference_cpu(rng):
    import_reference()
    import torch
    from training_avatar_texture import superresolution as ref

    torch.manual_seed(3)
    rs = ref.SuperresolutionHybrid8XDC(channels=32, img_resolution=512,
                                       sr_num_fp16_res=0, sr_antialias=True)
    s = SuperresolutionHybrid8XDC(channels=32, img_resolution=512,
                                  sr_num_fp16_res=0, sr_antialias=True)
    params = state_dict_to_params(torch_state_dict_numpy(rs))

    x = rng.randn(1, 32, 64, 64).astype(np.float32)
    rgb = x[:, :3]
    ws = rng.randn(1, 14, 512).astype(np.float32)

    want = rs(torch.as_tensor(rgb), torch.as_tensor(x), torch.as_tensor(ws),
              noise_mode='const', force_fp32=True).detach().numpy()
    got = np.asarray(s(params, jnp.asarray(rgb), jnp.asarray(x),
                       jnp.asarray(ws), noise_mode='const', force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)


def test_dual_discriminator_matches_reference_cpu(rng):
    import_reference()
    import torch
    from training_avatar_texture import dual_discriminator as ref

    torch.manual_seed(4)
    rd = ref.DualDiscriminator(c_dim=25, img_resolution=64, img_channels=3,
                               **SMALL)
    d = DualDiscriminator(c_dim=25, img_resolution=64, img_channels=3, **SMALL)
    params = state_dict_to_params(torch_state_dict_numpy(rd))

    img = rng.randn(4, 3, 64, 64).astype(np.float32)
    raw = rng.randn(4, 3, 16, 16).astype(np.float32)
    c = rng.randn(4, 25).astype(np.float32)

    want = rd({'image': torch.as_tensor(img), 'image_raw': torch.as_tensor(raw)},
              torch.as_tensor(c), force_fp32=True).detach().numpy()
    got = np.asarray(d(params, {'image': jnp.asarray(img),
                                'image_raw': jnp.asarray(raw)},
                       jnp.asarray(c), force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_persistence_pkl_roundtrip(tmp_path, rng):
    """Pickle a reference persistent module, load with OUR stub unpickler."""
    import_reference()
    import pickle
    import torch
    from training_avatar_texture import networks_stylegan2 as ref
    from next3d_tpu.utils.pkl_import import load_network_pkl

    torch.manual_seed(5)
    rg = ref.Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=8,
                       img_channels=3, **SMALL)
    p = tmp_path / "snap.pkl"
    with open(p, 'wb') as f:
        pickle.dump({'G_ema': rg, 'training_set_kwargs': {'k': 1}}, f)

    data = load_network_pkl(p)
    sd = data['G_ema'].state_dict()
    ref_sd = torch_state_dict_numpy(rg)
    assert set(sd) == set(ref_sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], ref_sd[k])
    assert data['G_ema'].init_kwargs['z_dim'] == 16

    params = state_dict_to_params(sd)
    g = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=8,
                  img_channels=3, **SMALL)
    z = rng.randn(2, 16).astype(np.float32)
    want = rg(torch.as_tensor(z), None, noise_mode='const',
              force_fp32=True).detach().numpy()
    got = np.asarray(g(params, jnp.asarray(z), None, noise_mode='const',
                       force_fp32=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_generator_random_noise_runs(rng):
    g = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=16,
                  img_channels=3, **SMALL)
    params = g.init(jax.random.PRNGKey(0))
    out = g(params, jnp.asarray(rng.randn(2, 16).astype(np.float32)), None,
            noise_mode='random', rng=jax.random.PRNGKey(1), force_fp32=True)
    assert out.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
