"""Scharr image gradients (reference: image/image_processing.py:4-31).

Kernels are Scharr/32 with reflect (default) or zero padding; depthwise over
channels.  Implemented as shifted adds on (H, W, C) arrays — exact and
XLA-fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scharr_gradients(image: jax.Array, reflect_padding: bool = True) -> tuple[jax.Array, jax.Array]:
    """Return (gx, gy) of an (H, W, C) image with Scharr/32 kernels.

    gx kernel: [[-3,0,3],[-10,0,10],[-3,0,3]]/32 (x = column direction);
    gy is its transpose.  Matches torch conv2d correlation semantics of the
    reference module.
    """
    mode = "reflect" if reflect_padding else "constant"
    p = jnp.pad(image, ((1, 1), (1, 1), (0, 0)), mode=mode)
    H, W, C = image.shape

    def s(dy, dx):
        return jax.lax.dynamic_slice(p, (dy, dx, 0), (H, W, C))

    inv32 = 1.0 / 32.0
    gx = (
        -3.0 * s(0, 0) + 3.0 * s(0, 2)
        - 10.0 * s(1, 0) + 10.0 * s(1, 2)
        - 3.0 * s(2, 0) + 3.0 * s(2, 2)
    ) * inv32
    gy = (
        -3.0 * s(0, 0) - 10.0 * s(0, 1) - 3.0 * s(0, 2)
        + 3.0 * s(2, 0) + 10.0 * s(2, 1) + 3.0 * s(2, 2)
    ) * inv32
    return gx, gy
