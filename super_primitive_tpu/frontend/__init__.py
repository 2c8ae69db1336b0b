"""Perception frontend: SAM segmentation + normals + integration (full
pipeline) and test stubs."""

from . import stub

__all__ = ["stub"]
