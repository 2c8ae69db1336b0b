"""Timing/observability utilities."""

from . import timing

__all__ = ["timing"]
