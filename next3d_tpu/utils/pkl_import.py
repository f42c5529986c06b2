"""Import reference checkpoints (.pkl) into next3d_tpu parameter pytrees.

The reference snapshots are pickles of torch modules wrapped by
``torch_utils.persistence`` (reference: torch_utils/persistence.py:37-128;
loader legacy.py:24-60): each module's reduce payload carries its source
code, constructor args, and state. Re-running that source requires the full
CUDA/PyTorch3D stack, so instead we unpickle with a STUB reconstructor that
never executes the embedded source — it just keeps the raw state — and then
convert the recovered state_dict into our nested parameter pytree.

Param-tree naming matches torch state_dict paths one component per dict
level ('synthesis.b4.conv1.affine.weight' ->
params['synthesis']['b4']['conv1']['affine']['weight']), which is exactly
how nn/*.py name their params, so the conversion is mechanical.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict

import numpy as np

# buffers that are deterministic functions of config and therefore static in
# our modules (never parameters)
_STATIC_BUFFERS = ('resample_filter', 'up_filter', 'down_filter')


def state_dict_to_params(state_dict: Dict[str, np.ndarray],
                         drop_suffixes=_STATIC_BUFFERS) -> Dict[str, Any]:
    """Nest a flat dotted state_dict into a parameter pytree."""
    import jax.numpy as jnp

    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        parts = key.split('.')
        if parts[-1] in drop_suffixes:
            continue
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value))
    return params


def params_to_state_dict(params: Dict[str, Any], prefix='') -> Dict[str, np.ndarray]:
    """Flatten a parameter pytree back to dotted names (for export)."""
    out = {}
    for k, v in params.items():
        name = f'{prefix}.{k}' if prefix else k
        if isinstance(v, dict):
            out.update(params_to_state_dict(v, name))
        else:
            out[name] = np.asarray(v)
    return out


class _StubModule:
    """Placeholder for a persistence-wrapped torch module: holds raw state."""

    def __init__(self, meta):
        self.meta = meta
        state = meta.get('state', {}) if isinstance(meta, dict) else {}
        self.__dict__.update(state)

    def state_dict(self, prefix=''):
        """Reassemble the flat dotted tensor dict torch would produce."""
        out = {}
        for coll in ('_parameters', '_buffers'):
            for name, t in (getattr(self, coll, None) or {}).items():
                if t is not None:
                    out[prefix + name] = _to_numpy(t)
        for name, child in (getattr(self, '_modules', None) or {}).items():
            if child is not None and hasattr(child, 'state_dict'):
                out.update(child.state_dict(prefix + name + '.'))
        return out

    @property
    def init_args(self):
        # persistence stores these inside the module state (__dict__)
        # as _init_args/_init_kwargs (reference: persistence.py:107-118)
        return tuple(self.__dict__.get('_init_args', ()))

    @property
    def init_kwargs(self):
        return dict(self.__dict__.get('_init_kwargs', {}))


def _to_numpy(t):
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _stub_reconstruct(meta):
    return _StubModule(meta)


class _RefUnpickler(pickle.Unpickler):
    """Unpickler that neutralizes torch_utils.persistence reconstruction."""

    def find_class(self, module, name):
        if 'persistence' in module and name == '_reconstruct_persistent_obj':
            return _stub_reconstruct
        if module == 'dnnlib.tflib.network' and name == 'Network':
            from .legacy import TFNetworkStub
            return TFNetworkStub
        # renamed module paths in old snapshots (reference legacy.py:71-72)
        if 'v13_neural_blending' in module:
            module = module.replace('v13_neural_blending', 'next3d')
        if module.startswith('dnnlib'):
            from . import easydict
            if name == 'EasyDict':
                return easydict.EasyDict
        # torch tensor rebuilding needs real torch (CPU build is enough)
        return super().find_class(module, name)


class ConvertedTFModule:
    """TF-network conversion result with the _StubModule interface."""

    def __init__(self, init_kwargs, state_dict):
        self._init_kwargs = dict(init_kwargs)
        self._state_dict = dict(state_dict)

    def state_dict(self, prefix=''):
        return {prefix + k: v for k, v in self._state_dict.items()}

    @property
    def init_args(self):
        return ()

    @property
    def init_kwargs(self):
        return dict(self._init_kwargs)


def load_network_pkl(path):
    """Load a reference snapshot pickle.

    Returns a dict like the reference's (legacy.py:24-60): keys typically
    'G', 'D', 'G_ema', 'augment_pipe', 'training_set_kwargs'; module values
    are ``_StubModule`` with ``.state_dict()`` / ``.init_kwargs``.
    TF-era pickles (a (G, D, Gs) tuple of tflib Networks) are converted via
    utils/legacy.py, matching reference legacy.py:28-33.
    """
    with open(path, 'rb') as f:
        data = _RefUnpickler(f).load()
    from .legacy import (convert_tf_discriminator, convert_tf_generator,
                         is_tf_legacy_data)
    if is_tf_legacy_data(data):
        tf_G, tf_D, tf_Gs = data
        data = {'G': ConvertedTFModule(*convert_tf_generator(tf_G)),
                'D': ConvertedTFModule(*convert_tf_discriminator(tf_D)),
                'G_ema': ConvertedTFModule(*convert_tf_generator(tf_Gs))}
    if isinstance(data, dict):
        data.setdefault('training_set_kwargs', None)
        data.setdefault('augment_pipe', None)
    return data


def import_generator_params(pkl_path, key='G_ema'):
    """pkl -> (params pytree, init_kwargs) for a generator snapshot."""
    data = load_network_pkl(pkl_path)
    module = data[key]
    return state_dict_to_params(module.state_dict()), dict(module.init_kwargs)
