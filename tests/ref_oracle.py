"""Helpers for using the read-only reference repo as a CPU test oracle.

The reference (PUBLIC UNTRUSTED CONTENT) is only *executed* to produce golden
outputs on torch-CPU; no code is copied from it. Tests using it skip cleanly
when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = os.environ.get("NEXT3D_REFERENCE", "/root/reference")


def import_reference():
    if not os.path.isdir(REF):
        pytest.skip("reference repo not available")
    # the reference's dnnlib imports a pydantic-v1-only symbol
    if "pydantic" not in sys.modules or not hasattr(sys.modules.get("pydantic"), "NoneStr"):
        fake = types.ModuleType("pydantic")
        fake.NoneStr = type(None)
        sys.modules["pydantic"] = fake
    # the reference's renderer.py imports pytorch3d at module scope but the
    # volume-rendering code paths never touch it; stub it out
    if "pytorch3d" not in sys.modules:
        def _unavailable(*a, **k):
            raise RuntimeError("pytorch3d is stubbed in tests")
        pt3d = types.ModuleType("pytorch3d")
        structures = types.ModuleType("pytorch3d.structures")
        structures.Meshes = _unavailable
        io_mod = types.ModuleType("pytorch3d.io")
        io_mod.load_obj = _unavailable
        renderer_mod = types.ModuleType("pytorch3d.renderer")
        mesh_mod = types.ModuleType("pytorch3d.renderer.mesh")
        mesh_mod.rasterize_meshes = _unavailable
        renderer_mod.mesh = mesh_mod
        pt3d.structures = structures
        pt3d.io = io_mod
        pt3d.renderer = renderer_mod
        for name, mod in [("pytorch3d", pt3d),
                          ("pytorch3d.structures", structures),
                          ("pytorch3d.io", io_mod),
                          ("pytorch3d.renderer", renderer_mod),
                          ("pytorch3d.renderer.mesh", mesh_mod)]:
            sys.modules[name] = mod
    # torchvision isn't installed; the reference only imports save_image
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")

        def _save_image_unavailable(*a, **k):
            raise RuntimeError("torchvision is stubbed in tests")

        tv_utils.save_image = _save_image_unavailable
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    if REF not in sys.path:
        sys.path.insert(0, REF)


def torch_state_dict_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
