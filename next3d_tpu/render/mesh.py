"""Mesh math helpers.

Behavioral spec: training_avatar_texture/volumetric_rendering/renderer.py
(face_vertices :444-462, generate_triangles :466-481, batch_orth_proj
:505-515, angle2matrix :518-547).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def face_vertices(vertices, faces):
    """Gather per-face vertex attributes.

    vertices: (B, V, D); faces: (B, F, 3) int -> (B, F, 3, D)
    (reference: renderer.py:444-462).
    """
    import jax
    return jax.vmap(lambda v, f: v[f])(vertices, faces.astype(jnp.int32))


def generate_triangles(h, w, margin_x=2, margin_y=5):
    """Dense UV-grid quad mesh with margins (reference: renderer.py:466-481)."""
    triangles = []
    for x in range(margin_x, w - 1 - margin_x):
        for y in range(margin_y, h - 1 - margin_y):
            triangle0 = [y * w + x, y * w + x + 1, (y + 1) * w + x]
            triangle1 = [y * w + x + 1, (y + 1) * w + x + 1, (y + 1) * w + x]
            triangles.append(triangle0)
            triangles.append(triangle1)
    triangles = np.array(triangles, dtype=np.int64)
    return triangles[:, [0, 2, 1]]


def batch_orth_proj(X, camera):
    """Orthographic projection: scale + xy translation
    (reference: renderer.py:505-515).

    X: (B, P, 3); camera: (3,) or (B, 3) = [scale, tx, ty].
    """
    camera = jnp.asarray(camera, X.dtype).reshape(-1, 1, 3)
    X_trans = X[:, :, :2] + camera[:, :, 1:]
    X_trans = jnp.concatenate([X_trans, X[:, :, 2:]], axis=2)
    return camera[:, :, 0:1] * X_trans


def angle2matrix(angles):
    """XYZ Euler degrees -> rotation matrices Rz@Ry@Rx
    (reference: renderer.py:518-547). angles: (B, 3)."""
    angles = jnp.asarray(angles, jnp.float32) * (np.pi / 180.0)
    s = jnp.sin(angles)
    c = jnp.cos(angles)
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    sx, sy, sz = s[:, 0], s[:, 1], s[:, 2]
    R = jnp.stack([
        cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
        sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
        -sy, cy * sx, cy * cx,
    ], axis=0)  # (9, B)
    return R.reshape(3, 3, -1).transpose(2, 0, 1)  # (B, 3, 3)


def transform_points(points, tform, points_scale=None, out_scale=None):
    """2D homogeneous point transform with optional range rescaling
    (reference: renderer.py:484-502)."""
    points_2d = points[:, :, :2]
    if points_scale:
        assert points_scale[0] == points_scale[1]
        points_2d = (points_2d * 0.5 + 0.5) * points_scale[0]
    B, P, _ = points.shape
    ones = jnp.ones((B, P, 1), points.dtype)
    trans = jnp.einsum('bpi,bij->bpj',
                       jnp.concatenate([points_2d, ones], axis=-1), tform)
    if out_scale:
        tx = trans[:, :, 0] / out_scale[1] * 2 - 1
        ty = trans[:, :, 1] / out_scale[0] * 2 - 1
        trans = jnp.stack([tx, ty], axis=-1)
    return jnp.concatenate([trans[:, :, :2], points[:, :, 2:]], axis=-1)
