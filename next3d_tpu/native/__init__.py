"""Native (C++) runtime pieces, loaded via ctypes with Python fallbacks."""

from .build import load_objparse
