"""Tiny tri-plane MLP decoder.

Behavioral spec: triplane_next3d.py:348-371 — mean over the 3 planes,
FC(32->64) -> softplus -> FC(64->33); rgb via MipNeRF sigmoid clamp; first
channel is raw sigma. Ignores ray directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.stylegan2 import FullyConnected


class OSGDecoder:
    def __init__(self, n_features, options=None):
        options = options or {}
        lr_mul = options.get('decoder_lr_mul', 1)
        out_dim = options.get('decoder_output_dim', 32)
        # bf16 MLP matmuls for perf runs (the flagship wires this from
        # force_fp32=False, the same policy as its bf16 synthesis blocks);
        # parity paths keep the fp32 HIGHEST-precision matmuls
        self.bf16 = bool(options.get('decoder_bf16', False))
        self.hidden_dim = 64
        self.fc0 = FullyConnected(n_features, self.hidden_dim, lr_multiplier=lr_mul)
        self.fc1 = FullyConnected(self.hidden_dim, 1 + out_dim, lr_multiplier=lr_mul)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        # torch Sequential indices: net.0 (FC), net.1 (Softplus), net.2 (FC)
        return {'net': {'0': self.fc0.init(k0), '2': self.fc1.init(k1)}}

    def __call__(self, params, sampled_features, ray_directions=None):
        x = jnp.mean(sampled_features, axis=1)  # (N, M, C)
        N, M, C = x.shape
        x = x.reshape(N * M, C)
        if self.bf16:
            x = x.astype(jnp.bfloat16)
        x = self.fc0(params['net']['0'], x)
        x = jax.nn.softplus(x)
        x = self.fc1(params['net']['2'], x)
        x = x.astype(jnp.float32).reshape(N, M, -1)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sigma = x[..., 0:1]
        return {'rgb': rgb, 'sigma': sigma}
