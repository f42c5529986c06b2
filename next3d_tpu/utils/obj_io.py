"""Wavefront .obj loading (FLAME topology + per-frame fitted meshes).

Replaces the reference's pytorch3d ``load_obj`` use (triplane_next3d.py:79-82)
and the per-item text parsing in the dataset (dataset.py:356-371). A C++
fast-parse path for the data pipeline plugs in behind the same API.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class ObjMesh(NamedTuple):
    verts: np.ndarray        # (V, 3) float32
    faces: np.ndarray        # (F, 3) int32  — vertex indices
    verts_uvs: Optional[np.ndarray]   # (T, 2) float32 or None
    faces_uvs: Optional[np.ndarray]   # (F, 3) int32 — uv indices or None


def load_obj(path) -> ObjMesh:
    verts, uvs, faces, faces_uv = [], [], [], []
    with open(path, 'r') as f:
        for line in f:
            if line.startswith('v '):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith('vt '):
                parts = line.split()
                uvs.append((float(parts[1]), float(parts[2])))
            elif line.startswith('f '):
                parts = line.split()[1:]
                vi, ti = [], []
                for p in parts:
                    comps = p.split('/')
                    vi.append(int(comps[0]) - 1)
                    if len(comps) > 1 and comps[1]:
                        ti.append(int(comps[1]) - 1)
                # triangulate fans for quads+ (FLAME is all triangles)
                for k in range(1, len(vi) - 1):
                    faces.append((vi[0], vi[k], vi[k + 1]))
                    if ti:
                        faces_uv.append((ti[0], ti[k], ti[k + 1]))
    return ObjMesh(
        verts=np.asarray(verts, np.float32),
        faces=np.asarray(faces, np.int32),
        verts_uvs=np.asarray(uvs, np.float32) if uvs else None,
        faces_uvs=np.asarray(faces_uv, np.int32) if faces_uv else None,
    )


def load_obj_verts(path) -> np.ndarray:
    """Vertices only (dataset fast path; reference: dataset.py:356-371).

    Uses the native C++ parser when available (next3d_tpu/native)."""
    try:
        from ..native.build import parse_vertices
        fast = parse_vertices(path)
        if fast is not None:
            return fast
    except Exception:
        pass
    verts = []
    with open(path, 'r') as f:
        for line in f:
            if line.startswith('v '):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
    return np.asarray(verts, np.float32)


def load_lms(path) -> np.ndarray:
    """Landmark .txt: whitespace floats, one landmark per line
    (reference: dataset.py:373-376). Native fast path when available."""
    try:
        from ..native.build import parse_floats
        fast = parse_floats(path)
        if fast is not None and fast.size % 3 == 0:
            return fast.reshape(-1, 3)
    except Exception:
        pass
    return np.loadtxt(path, dtype=np.float32)
