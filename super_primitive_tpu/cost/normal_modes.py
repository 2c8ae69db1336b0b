"""Residual channel modes with normal channels.

Reference: core/cost_utils.py (channel split by mode) and core/normal_cost.py
(rotating the source's normal channels into the target frame).  Only
``mode='colour'`` executes at reference runtime (two_frame_sfm.py:144,
odometery.py:327,730) — the cosine/kappa residual term is left at zero
(dense_optim.py:241-261) — but the channel plumbing is part of the API
surface, used when ``frontend.include_normals`` appends (nx, ny, nz[, kappa])
to the image.

Channels-last layout: pixels are (..., P, C) with C = 3 / 6 / 7 / 4 by mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MODES = ("colour", "colour_norm", "colour_norm_kappa", "norm_kappa")


def split_by_mode(pixels: jax.Array, mode: str = "colour"):
    """-> (affine_channels, cosine_channels, kappa) with None for absent."""
    if mode == "colour":
        return pixels[..., :3], None, None
    if mode == "colour_norm":
        return pixels[..., :3], pixels[..., 3:6], None
    if mode == "colour_norm_kappa":
        return pixels[..., :3], pixels[..., 3:6], pixels[..., 6:7]
    if mode == "norm_kappa":
        return None, pixels[..., :3], pixels[..., 3:4]
    raise ValueError(f"unknown mode {mode!r}")


def transform_normals(pixels: jax.Array, pose: jax.Array, mode: str = "colour"):
    """Rotate the normal channels by the pose rotation (normal_cost.py:21-44);
    identity for mode='colour'.  ``pose`` may carry leading batch dims that
    broadcast against the points axis."""
    if mode == "colour":
        return pixels
    _, normals, _ = split_by_mode(pixels, mode)
    R = jax.lax.stop_gradient(pose[..., :3, :3])
    rotated = jnp.einsum(
        "...ij,...pj->...pi", R, normals, precision=jax.lax.Precision.HIGHEST
    )
    if mode == "colour_norm":
        return jnp.concatenate([pixels[..., :3], rotated], axis=-1)
    if mode == "colour_norm_kappa":
        return jnp.concatenate([pixels[..., :3], rotated, pixels[..., 6:7]], axis=-1)
    if mode == "norm_kappa":
        return jnp.concatenate([rotated, pixels[..., 3:4]], axis=-1)
    raise ValueError(mode)
