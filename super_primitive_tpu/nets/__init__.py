"""Neural frontends: SAM (Flax) and the surface-normal network NNET."""

from . import efficientnet, nnet, sam

__all__ = ["efficientnet", "nnet", "sam"]
