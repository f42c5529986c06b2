"""Density cross-section sampling for debug images.

Behavioral spec: crosssection_utils.py:13-24 (reference) — sample sigma on a
2D slice through the volume for quick density visualization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sample_cross_section(G, params, ws, v, resolution=256, w=1.2, axis='y',
                         offset=0.0):
    """sigma on a plane perpendicular to ``axis`` at ``offset``; returns
    (resolution, resolution) array."""
    coords = np.linspace(-w / 2, w / 2, resolution, dtype=np.float32)
    a, b = np.meshgrid(coords, coords, indexing='ij')
    flat_a, flat_b = a.reshape(-1), b.reshape(-1)
    off = np.full_like(flat_a, offset)
    if axis == 'y':
        pts = np.stack([flat_a, off, flat_b], -1)
    elif axis == 'x':
        pts = np.stack([off, flat_a, flat_b], -1)
    else:
        pts = np.stack([flat_a, flat_b, off], -1)
    pts = jnp.asarray(pts[None])
    out = G.sample_mixed(params, pts, pts, ws, v, noise_mode='const')
    return np.asarray(out['sigma']).reshape(resolution, resolution)
