"""Photometric cost core (single + batched) over fixed-shape point bundles."""

from . import photometric

__all__ = ["photometric"]
