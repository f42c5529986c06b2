"""Per-pixel ray origins/directions from cam2world + intrinsics.

Behavioral spec: training_avatar_texture/volumetric_rendering/ray_sampler.py
:18-63 — OpenCV camera convention, pixel centers at (i+0.5)/res, skew-aware
unprojection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_rays(cam2world_matrix, intrinsics, resolution):
    """
    Args:
      cam2world_matrix: (N, 4, 4)
      intrinsics: (N, 3, 3) normalized intrinsics
      resolution: int

    Returns:
      ray_origins: (N, res*res, 3), ray_dirs: (N, res*res, 3)
    """
    N = cam2world_matrix.shape[0]
    M = resolution * resolution
    cam_locs_world = cam2world_matrix[:, :3, 3]
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    cx = intrinsics[:, 0, 2]
    cy = intrinsics[:, 1, 2]
    sk = intrinsics[:, 0, 1]

    # uv grid (reference :43-45): meshgrid('ij') stacked then channel-flipped
    # means x = column index (fast-varying in the flattened M axis) and
    # y = row index.
    coords = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    yy, xx = jnp.meshgrid(coords, coords, indexing='ij')
    x_cam = jnp.broadcast_to(xx.reshape(1, M), (N, M))
    y_cam = jnp.broadcast_to(yy.reshape(1, M), (N, M))
    z_cam = jnp.ones((N, M), jnp.float32)

    x_lift = (x_cam - cx[:, None] + cy[:, None] * sk[:, None] / fy[:, None]
              - sk[:, None] * y_cam / fy[:, None]) / fx[:, None] * z_cam
    y_lift = (y_cam - cy[:, None]) / fy[:, None] * z_cam

    cam_rel_points = jnp.stack(
        [x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)  # (N, M, 4)
    world_rel_points = jnp.einsum('nij,nmj->nmi', cam2world_matrix,
                                  cam_rel_points,
                                  precision=jax.lax.Precision.HIGHEST)[:, :, :3]

    ray_dirs = world_rel_points - cam_locs_world[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=2, keepdims=True)
    ray_origins = jnp.broadcast_to(cam_locs_world[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs
