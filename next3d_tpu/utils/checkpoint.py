"""Checkpointing: full-train-state snapshots + inference snapshots.

Fixes the reference's resume gap (SURVEY section 5.3/5.4: pickle snapshots
restore weights but NOT optimizer state / cur_nimg — warm start only,
training_loop.py:462-477): here the snapshot carries params_G/params_D/
params_G_ema, BOTH Adam states, cur_nimg and the PRNG key, so resume is an
exact continuation. Source-code pickling (torch_utils/persistence.py) is
replaced by config-driven reconstruction: the construction kwargs are stored
alongside as JSON.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import numpy as np


def _to_numpy_tree(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_snapshot(path, *, params_G=None, params_D=None, params_G_ema=None,
                  opt_state_G=None, opt_state_D=None, cur_nimg=0, rng_key=None,
                  config: Optional[Dict[str, Any]] = None, extra=None):
    payload = {
        'format_version': 1,
        'params_G': _to_numpy_tree(params_G) if params_G is not None else None,
        'params_D': _to_numpy_tree(params_D) if params_D is not None else None,
        'params_G_ema': _to_numpy_tree(params_G_ema) if params_G_ema is not None else None,
        'opt_state_G': _to_numpy_tree(opt_state_G) if opt_state_G is not None else None,
        'opt_state_D': _to_numpy_tree(opt_state_D) if opt_state_D is not None else None,
        'cur_nimg': int(cur_nimg),
        'rng_key': np.asarray(rng_key) if rng_key is not None else None,
        'config': config,
        'extra': extra,
    }
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    if config is not None:
        with open(os.path.splitext(path)[0] + '.json', 'w') as f:
            json.dump(config, f, indent=2, default=str)


def load_snapshot(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def load_any_generator(path, key='G_ema'):
    """Load generator params from either our snapshot format or a reference
    .pkl (legacy loader, SURVEY section 5.4). Returns (params, init_kwargs)."""
    try:
        snap = load_snapshot(path)
        if isinstance(snap, dict) and snap.get('format_version') == 1:
            cfg = (snap.get('config') or {}).get('G_kwargs', {})
            return snap['params_G_ema'] or snap['params_G'], cfg
    except Exception:
        pass
    from .pkl_import import import_generator_params
    return import_generator_params(path, key=key)
