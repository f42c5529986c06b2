"""Warm-start remapping for reference checkpoints.

Behavioral spec: training_avatar_texture/training_loop.py:180-207 — when
resuming from a vanilla EG3D pickle, the single 'backbone' weights are also
copied into the texture/mouth/blending backbones (with require_all=False:
only matching names+shapes transfer).
"""

from __future__ import annotations

import numpy as np


def copy_matching_params(dst, src, _path=''):
    """Recursively copy leaves from src into dst where names AND shapes match
    (the reference's misc.copy_params_and_buffers with require_all=False)."""
    import jax.numpy as jnp
    if not isinstance(dst, dict):
        if src is None:
            return dst
        src_arr = np.asarray(src)
        if tuple(src_arr.shape) == tuple(np.asarray(dst).shape):
            return jnp.asarray(src_arr)
        return dst
    out = {}
    for k, v in dst.items():
        out[k] = copy_matching_params(v, src.get(k) if isinstance(src, dict)
                                      else None, _path + '/' + str(k))
    return out


def eg3d_to_next3d(params):
    """EG3D -> Next3D warm-start mapping (reference training_loop.py:187-207):
    the EG3D backbone seeds texture_backbone / mouth_backbone /
    neural_blending alongside the static backbone."""
    if 'backbone' not in params:
        return params
    out = dict(params)
    for name in ('texture_backbone', 'mouth_backbone', 'neural_blending'):
        out.setdefault(name, params['backbone'])
    return out
