"""EG3D-pkl warm start (VERDICT r1 weak #7): a reference-FORMAT pickle
(persistence-wrapped module tree) round-trips through load_snapshot ->
state_dict -> eg3d_to_next3d remap -> copy_matching_params, seeding
texture/mouth/blending backbones from the EG3D backbone AND the D path,
exactly as the training loop's resume branch does
(training_loop.py resume else-branch; reference training_loop.py:180-207).
"""

import pickle
import sys
import types

import numpy as np
import pytest

import jax


def _fake_reconstruct(meta):  # resolved by name at load time
    raise RuntimeError('only unpickled through next3d_tpu loaders')


_fake_reconstruct.__module__ = 'torch_utils.persistence'
_fake_reconstruct.__qualname__ = '_reconstruct_persistent_obj'


class _FakePersistent:
    """Pickles as torch_utils.persistence._reconstruct_persistent_obj(meta),
    the exact wire format of reference snapshots."""

    def __init__(self, meta):
        self.meta = meta

    def __reduce__(self):
        return (_fake_reconstruct, (self.meta,))


def _module_stub(tree):
    """Nested param dict -> persistence-stub meta ({_parameters, _modules})."""
    leaves = {}
    children = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            children[k] = _module_stub(v)
        else:
            leaves[k] = np.asarray(v)
    return _FakePersistent({'state': {'_parameters': leaves, '_buffers': {},
                                      '_modules': children}})


def _register_fake_persistence():
    mod = types.ModuleType('torch_utils.persistence')
    mod._reconstruct_persistent_obj = _fake_reconstruct
    sys.modules.setdefault('torch_utils', types.ModuleType('torch_utils'))
    sys.modules['torch_utils.persistence'] = mod


def test_eg3d_pkl_warm_start_seeds_all_backbones(tmp_path, rng):
    from next3d_tpu.models import TriPlaneGenerator
    from next3d_tpu.nn import DualDiscriminator
    from next3d_tpu.train.warm_start import (copy_matching_params,
                                             eg3d_to_next3d)
    from next3d_tpu.utils.pkl_import import (load_network_pkl,
                                             state_dict_to_params)

    rk = dict(ray_start=2.25, ray_end=3.3, box_warp=1.0, depth_resolution=4,
              depth_resolution_importance=4, disparity_space_sampling=False,
              clamp_mode='softplus', c_gen_conditioning_zero=True,
              c_scale=1.0,
              superresolution_module='SuperresolutionHybrid2X',
              superresolution_noise_mode='none', sr_antialias=True)
    G = TriPlaneGenerator(z_dim=16, c_dim=25, w_dim=512, img_resolution=128,
                          img_channels=3,
                          topology_path='/root/reference/data/demo/demo.obj',
                          rendering_kwargs=rk, channel_base=1024,
                          channel_max=32, plane_resolution=64)
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=3,
                          channel_base=1024, channel_max=32)
    donor_G = jax.tree.map(np.asarray, G.init(jax.random.PRNGKey(7)))
    donor_D = jax.tree.map(np.asarray, D.init(jax.random.PRNGKey(8)))

    # an EG3D snapshot has only {backbone, superresolution, decoder} in G
    eg3d_tree = {'backbone': donor_G['backbone'],
                 'superresolution': donor_G['superresolution'],
                 'decoder': donor_G['decoder']}
    _register_fake_persistence()
    path = tmp_path / 'eg3d-snapshot.pkl'
    with open(path, 'wb') as f:
        pickle.dump({'G_ema': _module_stub(eg3d_tree),
                     'D': _module_stub(donor_D),
                     'G': None, 'augment_pipe': None,
                     'training_set_kwargs': None}, f)

    # == the training loop's reference-pkl resume branch ==
    snap = load_network_pkl(str(path))
    imported = eg3d_to_next3d(state_dict_to_params(snap['G_ema'].state_dict()))
    params_G = copy_matching_params(G.init(jax.random.PRNGKey(0)), imported)
    params_D = copy_matching_params(
        D.init(jax.random.PRNGKey(1)),
        state_dict_to_params(snap['D'].state_dict()))

    # static backbone copied verbatim; texture/mouth/blending seeded from it
    got = np.asarray(
        params_G['backbone']['synthesis']['b4']['conv1']['weight'])
    want = np.asarray(
        donor_G['backbone']['synthesis']['b4']['conv1']['weight'])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(params_G['texture_backbone']['mapping']['fc0']['weight']),
        np.asarray(donor_G['backbone']['mapping']['fc0']['weight']))
    # mouth/blending are StyleUNets: only name+shape matches copy (the
    # require_all=False semantics); their mapping stacks match the backbone
    np.testing.assert_array_equal(
        np.asarray(params_G['mouth_backbone']['mapping']['fc0']['weight']),
        np.asarray(donor_G['backbone']['mapping']['fc0']['weight']))

    # D path copied end-to-end
    np.testing.assert_array_equal(
        np.asarray(params_D['b4']['conv']['weight']),
        np.asarray(donor_D['b4']['conv']['weight']))

    # superresolution + decoder transferred
    np.testing.assert_array_equal(
        np.asarray(params_G['decoder']['net']['0']['weight']),
        np.asarray(donor_G['decoder']['net']['0']['weight']))
