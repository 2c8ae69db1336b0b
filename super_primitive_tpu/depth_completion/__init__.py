"""Segment-based depth completion + VOID metrics."""

from . import completion, fill_in, metrics

__all__ = ["completion", "fill_in", "metrics"]
