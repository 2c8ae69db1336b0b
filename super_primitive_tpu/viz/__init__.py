"""Headless artifact export (PLY/PNG/plots) — replaces the Open3D GUI."""

from . import export

__all__ = ["export"]
