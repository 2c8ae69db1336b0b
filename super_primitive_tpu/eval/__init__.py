"""Evaluation: trajectory alignment/ATE (self-contained evo replacement)."""

from . import trajectory

__all__ = ["trajectory"]
