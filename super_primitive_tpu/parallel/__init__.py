"""Mesh construction and sharding layouts (multi-chip extension)."""

from . import mesh

__all__ = ["mesh"]
