"""Bilinear image sampling with exact ``grid_sample`` semantics.

The reference's hot loop samples both source and target images via
``torch.nn.functional.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True)`` and masks points with |normalized coord| > 0.99
(core/dense_optim.py:128-140).  This module reproduces those semantics with a
gather-based formulation that XLA fuses into the surrounding cost computation
(one dynamic-gather + 4-tap lerp; no scatter, no data-dependent shapes).

Layout choice (TPU-first): images are channels-last (H, W, C) so the gather's
innermost contiguous axis is the channel axis and the 4 taps vectorize on the
VPU.  The reference is channels-first; conversion happens at keyframe build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VALID_BOUND = 0.99  # reference: |coord_norm| <= 0.99 validity (dense_optim.py:129)


def bilinear_sample(image: jax.Array, coords_norm: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sample ``image`` (H, W, C) at normalized (x, y) coords (..., N, 2).

    Returns (samples (..., N, C), valid (..., N) bool).

    Semantics match ``grid_sample(align_corners=True, padding_mode='zeros')``:
      pixel = (coord + 1)/2 * (size - 1); out-of-range taps contribute zero.
    Validity additionally requires |coord_norm| <= 0.99 on both axes
    (core/dense_optim.py:128-131).
    """
    H, W, C = image.shape
    x = (coords_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords_norm[..., 1] + 1.0) * 0.5 * (H - 1)

    valid = jnp.all(jnp.abs(coords_norm) <= VALID_BOUND, axis=-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        flat = image.reshape(H * W, C)
        vals = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return vals * inb[..., None].astype(image.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    samples = top * (1.0 - wy) + bot * wy
    return samples, valid


def bilinear_sample_grad(
    image: jax.Array, coords_norm: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample plus the analytic derivative of the bilinear interpolant.

    Returns (samples (..., N, C), dval_dcoord (..., N, C, 2), valid (..., N)).
    ``dval_dcoord`` is the exact piecewise derivative w.r.t. the *normalized*
    coordinates — identical to forward-mode AD through
    :func:`bilinear_sample`, but computed from the four gathered corners in
    the same pass (one gather instead of one per tangent column).  The hot
    Gauss-Newton linearizations (solve/gn_mapping.py) chain this with the
    closed-form projection/pose Jacobians.
    """
    H, W, C = image.shape
    x = (coords_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords_norm[..., 1] + 1.0) * 0.5 * (H - 1)

    valid = jnp.all(jnp.abs(coords_norm) <= VALID_BOUND, axis=-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        flat = image.reshape(H * W, C)
        vals = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return vals * inb[..., None].astype(image.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    wxc = wx[..., None].astype(image.dtype)
    wyc = wy[..., None].astype(image.dtype)
    top = v00 * (1.0 - wxc) + v01 * wxc
    bot = v10 * (1.0 - wxc) + v11 * wxc
    samples = top * (1.0 - wyc) + bot * wyc

    # d/dx_pix and d/dy_pix of the interpolant inside the current cell
    ddx = (v01 - v00) * (1.0 - wyc) + (v11 - v10) * wyc
    ddy = (v10 - v00) * (1.0 - wxc) + (v11 - v01) * wxc
    dval = jnp.stack(
        [ddx * (0.5 * (W - 1)), ddy * (0.5 * (H - 1))], axis=-1
    )  # chain through x_pix = (coord + 1)/2 * (size - 1)
    return samples, dval, valid


def sample_at_pixels(image: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sample (H, W, C) image at *pixel* (u, v) coordinates (..., N, 2).

    Normalizes to [-1, 1] with the align_corners convention then delegates to
    :func:`bilinear_sample` — the composition the reference performs in
    ``get_pixels`` (core/dense_optim.py:143-162).
    """
    H, W, _ = image.shape
    dims = jnp.asarray([W - 1, H - 1], dtype=jnp.float32)
    coords_norm = 2.0 * uv / dims - 1.0
    return bilinear_sample(image, coords_norm)
