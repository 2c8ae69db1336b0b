"""On-device optimization loops: retraction-Adam scans and problem drivers."""

from . import retraction_adam, two_frame

__all__ = ["retraction_adam", "two_frame"]
