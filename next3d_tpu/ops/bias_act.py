"""Fused bias + activation (+ gain, + clamp).

Reference semantics: torch_utils/ops/bias_act.py:54-122 (activation table at
:23-33; the CUDA kernel bias_act.cu exists purely to fuse these elementwise
steps). On TPU, XLA fuses this chain into the producing matmul/conv epilogue
automatically, so a single jnp composition IS the fused kernel; gradients of
any order come from autodiff.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class _ActSpec(NamedTuple):
    func: callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    'linear':   _ActSpec(lambda x, alpha: x,                          0.0, 1.0),
    'relu':     _ActSpec(lambda x, alpha: jax.nn.relu(x),             0.0, math.sqrt(2)),
    'lrelu':    _ActSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, math.sqrt(2)),
    'tanh':     _ActSpec(lambda x, alpha: jnp.tanh(x),                0.0, 1.0),
    'sigmoid':  _ActSpec(lambda x, alpha: jax.nn.sigmoid(x),          0.0, 1.0),
    'elu':      _ActSpec(lambda x, alpha: jax.nn.elu(x),              0.0, 1.0),
    'selu':     _ActSpec(lambda x, alpha: jax.nn.selu(x),             0.0, 1.0),
    'softplus': _ActSpec(lambda x, alpha: jax.nn.softplus(x),         0.0, 1.0),
    'swish':    _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x,      0.0, math.sqrt(2)),
}


def bias_act(x, b=None, dim=1, act='linear', alpha=None, gain=None, clamp=None):
    """Add bias along ``dim``, apply activation, scale by gain, clamp.

    Matches torch_utils/ops/bias_act.py:93-122 numerically.
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1)
    assert clamp is None or clamp >= 0 or clamp == -1

    if b is not None:
        assert b.ndim == 1
        assert 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        shape = [-1 if i == dim else 1 for i in range(x.ndim)]
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)

    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)

    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
