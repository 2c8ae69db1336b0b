"""Bilateral normal integration (BiNI) — batched matrix-free CG on device."""

from . import bini

__all__ = ["bini"]
