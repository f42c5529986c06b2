"""Name -> constructor registry.

Replaces the reference's runtime dotted-name resolution
(``dnnlib.util.construct_class_by_name``, dnnlib/util.py:291-307) with an
explicit registry plus an importlib fallback, so configs can select
G/D/SR/loss variants by string (reference usage:
training_avatar_texture/training_loop.py:148,169,176).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def resolve(name: str) -> Callable:
    if name in _REGISTRY:
        return _REGISTRY[name]
    # dotted-path fallback ("pkg.mod.ClassName")
    if "." in name:
        mod_name, _, attr = name.rpartition(".")
        mod = importlib.import_module(mod_name)
        return getattr(mod, attr)
    raise KeyError(f"unknown registered name: {name!r}; known: {sorted(_REGISTRY)}")


def construct_class_by_name(class_name: str, **kwargs) -> Any:
    return resolve(class_name)(**kwargs)
