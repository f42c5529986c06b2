"""Build + load the native parsing library (g++ -> shared object, ctypes).

No pybind11 in this toolchain; the C ABI + ctypes keeps the binding layer
dependency-free. The library is compiled on first use and cached next to the
source (hash-keyed like the reference's torch_utils/custom_ops.py:109-139
build-dir trick).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build_lib():
    src = os.path.join(_HERE, 'objparse.cpp')
    with open(src, 'rb') as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    out = os.path.join(_HERE, f'_objparse_{digest}.so')
    if not os.path.exists(out):
        cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', src,
               '-o', out + '.tmp']
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(out + '.tmp', out)
    return out


def load_objparse():
    """Returns the ctypes lib or None if the toolchain is unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        try:
            path = _build_lib()
            lib = ctypes.CDLL(path)
            lib.objparse_vertices.restype = ctypes.c_int64
            lib.objparse_vertices.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64]
            lib.objparse_floats.restype = ctypes.c_int64
            lib.objparse_floats.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64]
            _LIB = lib
        except Exception:
            _BUILD_FAILED = True
            _LIB = None
        return _LIB


def parse_vertices(path, max_verts=200000):
    """Fast 'v x y z' parse -> (N, 3) float32, or None if native unavailable."""
    lib = load_objparse()
    if lib is None:
        return None
    out = np.empty((max_verts, 3), np.float32)
    n = lib.objparse_vertices(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_verts)
    if n < 0:
        raise IOError(f'cannot read {path}')
    return out[:n].copy()


def parse_floats(path, max_floats=1 << 20):
    lib = load_objparse()
    if lib is None:
        return None
    out = np.empty((max_floats,), np.float32)
    n = lib.objparse_floats(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_floats)
    if n < 0:
        raise IOError(f'cannot read {path}')
    return out[:n].copy()
