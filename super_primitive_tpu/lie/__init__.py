"""Pure-JAX Lie groups (SO(3)/SE(3)) — replaces the reference's lietorch
C++/CUDA extension and hand-rolled torch maps (reference: lie/)."""

from . import se3, sim3, so3

__all__ = ["so3", "se3", "sim3"]
