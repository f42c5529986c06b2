"""TF-era pickle conversion (utils/legacy.py vs reference legacy.py:24-295):
a synthetic tflib-Network pickle for a tiny SG2 config round-trips into a
runnable generator/discriminator with correctly mapped + transformed
weights."""

import pickle
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _fake_tflib_network_pickle(tmp_path, rng):
    """Pickle a (G, D, Gs) tuple whose elements unpickle via the module
    path 'dnnlib.tflib.network.Network', carrying TF-style variables for a
    16px skip-architecture SG2 G and resnet D."""
    res = 16
    fmap_base, fmap_max = 512, 32

    def nf(stage):
        return int(min(fmap_base * 2 / (2.0 ** stage) * 8, fmap_max))

    gvars = [('dlatent_avg', rng.randn(8).astype(np.float32))]
    for i in range(2):
        gvars += [(f'mapping/Dense{i}/weight',
                   rng.randn(8, 8).astype(np.float32)),
                  (f'mapping/Dense{i}/bias', rng.randn(8).astype(np.float32))]
    # channels chosen to match our Generator(channel_base=2*512, cmax=32)
    ch = {4: 32, 8: 32, 16: 32}
    gvars += [('synthesis/4x4/Const/const',
               rng.randn(1, ch[4], 4, 4).astype(np.float32))]

    def conv_vars(path, cin, cout, k, noise=None):
        out = [(f'{path}/weight', rng.randn(k, k, cin, cout)
                .astype(np.float32)),
               (f'{path}/bias', rng.randn(cout).astype(np.float32)),
               (f'{path}/mod_weight', rng.randn(8, cin).astype(np.float32)),
               (f'{path}/mod_bias', rng.randn(cin).astype(np.float32))]
        if noise is not None:
            out += [(f'{path}/noise_strength',
                     np.float32(rng.randn() * 0.1))]
        return out

    gvars += conv_vars('synthesis/4x4/Conv', ch[4], ch[4], 3, noise=0)
    gvars += [('synthesis/noise0', rng.randn(1, 1, 4, 4).astype(np.float32))]
    gvars += conv_vars('synthesis/4x4/ToRGB', ch[4], 3, 1)
    for r in (8, 16):
        lg = int(np.log2(r))
        gvars += conv_vars(f'synthesis/{r}x{r}/Conv0_up', ch[r // 2], ch[r],
                           3, noise=2 * lg - 5)
        gvars += conv_vars(f'synthesis/{r}x{r}/Conv1', ch[r], ch[r], 3,
                           noise=2 * lg - 4)
        gvars += [(f'synthesis/noise{2 * lg - 5}',
                   rng.randn(1, 1, r, r).astype(np.float32)),
                  (f'synthesis/noise{2 * lg - 4}',
                   rng.randn(1, 1, r, r).astype(np.float32))]
        gvars += conv_vars(f'synthesis/{r}x{r}/ToRGB', ch[r], 3, 1)

    dvars = []
    for r in (16,):
        dvars += [(f'{r}x{r}/FromRGB/weight',
                   rng.randn(1, 1, 3, ch[r]).astype(np.float32)),
                  (f'{r}x{r}/FromRGB/bias',
                   rng.randn(ch[r]).astype(np.float32))]
    for r in (16, 8):
        dvars += [(f'{r}x{r}/Conv0/weight',
                   rng.randn(3, 3, ch[r], ch[r]).astype(np.float32)),
                  (f'{r}x{r}/Conv0/bias', rng.randn(ch[r]).astype(np.float32)),
                  (f'{r}x{r}/Conv1_down/weight',
                   rng.randn(3, 3, ch[r], ch[r // 2]).astype(np.float32)),
                  (f'{r}x{r}/Conv1_down/bias',
                   rng.randn(ch[r // 2]).astype(np.float32)),
                  (f'{r}x{r}/Skip/weight',
                   rng.randn(1, 1, ch[r], ch[r // 2]).astype(np.float32))]
    dvars += [('4x4/Conv/weight', rng.randn(3, 3, ch[4] + 1, ch[4])
               .astype(np.float32)),
              ('4x4/Conv/bias', rng.randn(ch[4]).astype(np.float32)),
              ('4x4/Dense0/weight', rng.randn(ch[4] * 16, ch[4])
               .astype(np.float32)),
              ('4x4/Dense0/bias', rng.randn(ch[4]).astype(np.float32)),
              ('Output/weight', rng.randn(ch[4], 1).astype(np.float32)),
              ('Output/bias', rng.randn(1).astype(np.float32))]

    g_state = dict(version=4, name='G',
                   static_kwargs=dict(latent_size=8, dlatent_size=8,
                                      resolution=res, num_channels=3,
                                      fmap_base=fmap_base, fmap_max=fmap_max,
                                      mapping_layers=2),
                   components={}, variables=gvars)
    d_state = dict(version=4, name='D',
                   static_kwargs=dict(resolution=res, num_channels=3,
                                      fmap_base=fmap_base, fmap_max=fmap_max,
                                      mbstd_group_size=2),
                   components={}, variables=dvars)

    # emit a pickle whose class reference is the tflib module path: register
    # a stand-in module so pickle can resolve it at dump time; load time
    # goes through our unpickler's find_class remap instead
    class NetworkPickled:
        pass
    NetworkPickled.__module__ = 'dnnlib.tflib.network'
    NetworkPickled.__qualname__ = 'Network'
    NetworkPickled.__name__ = 'Network'

    def make(state):
        obj = NetworkPickled()
        obj.__dict__.update(state)
        return obj

    mod = types.ModuleType('dnnlib.tflib.network')
    mod.Network = NetworkPickled
    sys.modules.setdefault('dnnlib', types.ModuleType('dnnlib'))
    sys.modules.setdefault('dnnlib.tflib', types.ModuleType('dnnlib.tflib'))
    sys.modules['dnnlib.tflib.network'] = mod

    path = tmp_path / 'legacy_tf.pkl'
    with open(path, 'wb') as f:
        pickle.dump((make(g_state), make(d_state), make(g_state)), f)
    return str(path), g_state, d_state


def test_tf_legacy_pickle_converts_and_runs(tmp_path, rng):
    from next3d_tpu.nn import Discriminator, Generator
    from next3d_tpu.train.warm_start import copy_matching_params
    from next3d_tpu.utils.pkl_import import (load_network_pkl,
                                             state_dict_to_params)

    path, g_state, _ = _fake_tflib_network_pickle(tmp_path, rng)
    data = load_network_pkl(path)
    assert set(data) >= {'G', 'D', 'G_ema', 'augment_pipe',
                         'training_set_kwargs'}

    gk = data['G_ema'].init_kwargs
    assert gk['img_resolution'] == 16 and gk['channel_base'] == 1024
    sd = data['G_ema'].state_dict()

    # weight-mapping spot checks (legacy.py:175-207)
    tfv = dict(g_state['variables'])
    np.testing.assert_array_equal(sd['mapping.w_avg'], tfv['dlatent_avg'])
    np.testing.assert_array_equal(
        sd['mapping.fc0.weight'], tfv['mapping/Dense0/weight'].T)
    np.testing.assert_array_equal(
        sd['synthesis.b8.conv0.weight'],
        tfv['synthesis/8x8/Conv0_up/weight'][::-1, ::-1]
        .transpose(3, 2, 0, 1))
    np.testing.assert_array_equal(
        sd['synthesis.b8.conv1.affine.bias'],
        tfv['synthesis/8x8/Conv1/mod_bias'] + 1)

    # the converted snapshot builds + runs through our Generator
    G = Generator(z_dim=gk['z_dim'], c_dim=gk['c_dim'], w_dim=gk['w_dim'],
                  img_resolution=gk['img_resolution'],
                  img_channels=gk['img_channels'],
                  channel_base=gk['channel_base'],
                  channel_max=gk['channel_max'],
                  mapping_kwargs=dict(
                      num_layers=gk['mapping_kwargs']['num_layers']))
    params = copy_matching_params(
        G.init(jax.random.PRNGKey(0)), state_dict_to_params(sd))
    img = G(params, jnp.asarray(rng.randn(2, 8).astype(np.float32)), None,
            noise_mode='const', force_fp32=True)
    assert img.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()

    # D converts too
    dk = data['D'].init_kwargs
    D = Discriminator(c_dim=0, img_resolution=16, img_channels=3,
                      channel_base=dk['channel_base'],
                      channel_max=dk['channel_max'],
                      epilogue_kwargs=dict(mbstd_group_size=2))
    dparams = copy_matching_params(
        D.init(jax.random.PRNGKey(1)),
        state_dict_to_params(data['D'].state_dict()))
    logits = D(dparams, jnp.asarray(rng.randn(2, 3, 16, 16)
                                    .astype(np.float32)), None)
    assert np.isfinite(np.asarray(logits)).all()
