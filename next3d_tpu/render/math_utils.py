"""Ray/box math.

Behavioral spec: training_avatar_texture/volumetric_rendering/math_utils.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vecs(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def get_ray_limits_box(rays_o, rays_d, box_side_length):
    """Ray/AABB intersection over the [-box/2, box/2]^3 volume.

    Returns (tmin, tmax), each (..., 1); invalid rays get (-1, -2)
    (reference: math_utils.py:46-98).
    """
    o_shape = rays_o.shape
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)

    half = box_side_length / 2
    bounds = jnp.array([[-half] * 3, [half] * 3], rays_o.dtype)  # (2, 3)

    invdir = 1 / rays_d
    sign = (invdir < 0).astype(jnp.int32)  # (R, 3): 1 if dir negative

    def plane(axis):
        lo = bounds[sign[:, axis], axis]
        hi = bounds[1 - sign[:, axis], axis]
        tmin = (lo - rays_o[:, axis]) * invdir[:, axis]
        tmax = (hi - rays_o[:, axis]) * invdir[:, axis]
        return tmin, tmax

    tmin, tmax = plane(0)
    tymin, tymax = plane(1)
    is_valid = ~((tmin > tymax) | (tymin > tmax))
    tmin = jnp.maximum(tmin, tymin)
    tmax = jnp.minimum(tmax, tymax)

    tzmin, tzmax = plane(2)
    is_valid &= ~((tmin > tzmax) | (tzmin > tmax))
    tmin = jnp.maximum(tmin, tzmin)
    tmax = jnp.minimum(tmax, tzmax)

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return (tmin.reshape(*o_shape[:-1], 1), tmax.reshape(*o_shape[:-1], 1))


def linspace_batch(start, stop, num):
    """(num, *start.shape) evenly spaced start..stop inclusive
    (reference: math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((-1,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
