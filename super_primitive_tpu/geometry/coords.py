"""Coordinate (de)normalization — exact reference semantics.

The reference stores keypoints in align_corners=True normalized [-1, 1]
coordinates and converts with (tool/point_utils.py:31-40):

    norm   = 2 * pixel / (dim - 1) - 1
    pixel  = round(0.5 * (dim - 1) * (norm + 1))

``dims`` ordering follows the call site: keypoints are (row, col) with
dims=(H, W); grid-sample coordinates are (x, y) with dims=(W, H).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_coords(x_pixel: jax.Array, dims) -> jax.Array:
    """Pixel coordinates -> [-1, 1], align_corners=True convention."""
    dims = jnp.asarray(dims, dtype=jnp.float32)
    return 2.0 * x_pixel / (dims - 1.0) - 1.0


def denormalize_coords(x_norm: jax.Array, dims) -> jax.Array:
    """[-1, 1] -> rounded integer pixel coordinates (reference rounds to long,
    tool/point_utils.py:37-40)."""
    dims = jnp.asarray(dims, dtype=jnp.float32)
    x_pixel = 0.5 * (dims - 1.0) * (x_norm + 1.0)
    return jnp.round(x_pixel).astype(jnp.int32)


def denormalize_coords_f(x_norm: jax.Array, dims) -> jax.Array:
    """[-1, 1] -> continuous pixel coordinates (no rounding)."""
    dims = jnp.asarray(dims, dtype=jnp.float32)
    return 0.5 * (dims - 1.0) * (x_norm + 1.0)
