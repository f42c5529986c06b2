"""Midpoint volume compositing (MipRayMarcher2).

Behavioral spec: training_avatar_texture/volumetric_rendering/ray_marcher.py
:22-77 — softplus(sigma_mid - 1) density activation, alpha compositing with
exclusive cumprod transmittance, composite depth clamped to the sample range,
rgb rescaled to (-1, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mip_ray_marcher2(colors, densities, depths, rendering_options):
    """
    Args:
      colors: (N, R, S, C); densities: (N, R, S, 1); depths: (N, R, S, 1).

    Returns:
      (composite_rgb (N, R, C), composite_depth (N, R, 1), weights (N, R, S-1, 1))
    """
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    assert rendering_options.get('clamp_mode', 'softplus') == 'softplus', \
        "only clamp_mode='softplus' is supported (as in the reference)"
    densities_mid = jax.nn.softplus(densities_mid - 1)

    density_delta = densities_mid * deltas
    alpha = 1 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], axis=-2)
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if rendering_options.get('white_back', False):
        composite_rgb = composite_rgb + 1 - weight_total

    composite_rgb = composite_rgb * 2 - 1
    return composite_rgb, composite_depth, weights
