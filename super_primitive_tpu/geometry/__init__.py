"""Projection, coordinate conventions, and camera utilities."""

from . import coords, projection

__all__ = ["coords", "projection"]
