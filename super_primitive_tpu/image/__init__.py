"""Image pyramid and gradient ops (channels-last, shift-add stencils)."""

from . import gradients, pyramid

__all__ = ["pyramid", "gradients"]
