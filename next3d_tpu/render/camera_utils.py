"""Camera pose samplers (y-up sphere) and intrinsics helpers.

Behavioral spec: camera_utils.py (LookAtPoseSampler :58-86,
create_cam2world_matrix :118-137, FOV_to_intrinsics :140-149).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .math_utils import normalize_vecs


def create_cam2world_matrix(forward_vector, origin):
    """forward (N, 3), origin (N, 3) -> (N, 4, 4); y-up, no roll
    (reference: camera_utils.py:118-137)."""
    forward_vector = normalize_vecs(forward_vector)
    up_vector = jnp.broadcast_to(jnp.array([0., 1., 0.], forward_vector.dtype),
                                 forward_vector.shape)
    right_vector = -normalize_vecs(jnp.cross(up_vector, forward_vector))
    up_vector = normalize_vecs(jnp.cross(forward_vector, right_vector))

    N = forward_vector.shape[0]
    rotation = jnp.tile(jnp.eye(4, dtype=forward_vector.dtype), (N, 1, 1))
    rotation = rotation.at[:, :3, :3].set(
        jnp.stack([right_vector, up_vector, forward_vector], axis=-1))
    translation = jnp.tile(jnp.eye(4, dtype=forward_vector.dtype), (N, 1, 1))
    translation = translation.at[:, :3, 3].set(origin)
    return translation @ rotation


def _origins_from_angles(h, v, radius):
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    theta = h
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    ox = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    oz = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    oy = radius * jnp.cos(phi)
    return jnp.concatenate([ox, oy, oz], axis=1)


def lookat_pose(horizontal_mean, vertical_mean, lookat_position, radius=1,
                batch_size=1, horizontal_stddev=0, vertical_stddev=0, rng=None):
    """LookAtPoseSampler.sample (reference: camera_utils.py:68-86)."""
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), float(horizontal_mean))
        v = jnp.full((batch_size, 1), float(vertical_mean))
    origins = _origins_from_angles(h, v, radius)
    lookat = jnp.broadcast_to(jnp.asarray(lookat_position, jnp.float32),
                              origins.shape)
    forward = normalize_vecs(lookat - origins)
    return create_cam2world_matrix(forward, origins)


def gaussian_pose(horizontal_mean, vertical_mean, radius=1, batch_size=1,
                  horizontal_stddev=0, vertical_stddev=0, rng=None):
    """GaussianCameraPoseSampler.sample (reference: camera_utils.py:38-55)."""
    return lookat_pose(horizontal_mean, vertical_mean,
                       jnp.zeros(3), radius, batch_size,
                       horizontal_stddev, vertical_stddev, rng)


def uniform_pose(horizontal_mean, vertical_mean, radius=1, batch_size=1,
                 horizontal_stddev=0, vertical_stddev=0, rng=None):
    """UniformCameraPoseSampler.sample (reference: camera_utils.py:99-116)."""
    if rng is not None and (horizontal_stddev or vertical_stddev):
        kh, kv = jax.random.split(rng)
        h = (jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * horizontal_stddev + horizontal_mean
        v = (jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * vertical_stddev + vertical_mean
    else:
        h = jnp.full((batch_size, 1), float(horizontal_mean))
        v = jnp.full((batch_size, 1), float(vertical_mean))
    origins = _origins_from_angles(h, v, radius)
    forward = normalize_vecs(-origins)
    return create_cam2world_matrix(forward, origins)


def fov_to_intrinsics(fov_degrees):
    """Normalized 3x3 intrinsics from FOV (reference: camera_utils.py:140-149)."""
    focal_length = float(1 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414))
    return np.array([[focal_length, 0, 0.5],
                     [0, focal_length, 0.5],
                     [0, 0, 1]], dtype=np.float32)
