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


def _corner_taps(image: jax.Array, coords_norm: jax.Array):
    """Shared 4-tap machinery: pixel mapping ((coord+1)/2 * (size-1)),
    per-tap out-of-range zeroing, fractional weights, validity bound.

    Returns (v00, v01, v10, v11, wx, wy, valid) with the taps (..., N, C)
    and weights (..., N, 1) in the image dtype."""
    H, W, C = image.shape
    x = (coords_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords_norm[..., 1] + 1.0) * 0.5 * (H - 1)

    valid = jnp.all(jnp.abs(coords_norm) <= VALID_BOUND, axis=-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None].astype(image.dtype)
    wy = (y - y0)[..., None].astype(image.dtype)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        flat = image.reshape(H * W, C)
        vals = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return vals * inb[..., None].astype(image.dtype)

    return (
        tap(y0i, x0i), tap(y0i, x0i + 1),
        tap(y0i + 1, x0i), tap(y0i + 1, x0i + 1),
        wx, wy, valid,
    )


def _lerp_and_grad(v00, v01, v10, v11, wx, wy, H, W):
    """Bilinear combine + the analytic in-cell derivative (w.r.t. the
    NORMALIZED coordinates; chain through x_pix = (coord+1)/2 * (size-1))."""
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    samples = top * (1.0 - wy) + bot * wy
    ddx = (v01 - v00) * (1.0 - wy) + (v11 - v10) * wy
    ddy = (v10 - v00) * (1.0 - wx) + (v11 - v01) * wx
    dval = jnp.stack(
        [ddx * (0.5 * (W - 1)), ddy * (0.5 * (H - 1))], axis=-1
    )
    return samples, dval


def bilinear_sample(image: jax.Array, coords_norm: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sample ``image`` (H, W, C) at normalized (x, y) coords (..., N, 2).

    Returns (samples (..., N, C), valid (..., N) bool).

    Semantics match ``grid_sample(align_corners=True, padding_mode='zeros')``:
      pixel = (coord + 1)/2 * (size - 1); out-of-range taps contribute zero.
    Validity additionally requires |coord_norm| <= 0.99 on both axes
    (core/dense_optim.py:128-131).
    """
    H, W, _ = image.shape
    v00, v01, v10, v11, wx, wy, valid = _corner_taps(image, coords_norm)
    samples, _ = _lerp_and_grad(v00, v01, v10, v11, wx, wy, H, W)
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
    H, W, _ = image.shape
    v00, v01, v10, v11, wx, wy, valid = _corner_taps(image, coords_norm)
    samples, dval = _lerp_and_grad(v00, v01, v10, v11, wx, wy, H, W)
    return samples, dval, valid


def pack_bilinear_taps(image: jax.Array) -> jax.Array:
    """(H, W, C) -> (H, W, 4C) with channel blocks [v00 | v01 | v10 | v11]:
    the four bilinear taps of the cell whose origin is that pixel.

    One row-gather at the cell origin then fetches all four taps —
    :func:`bilinear_sample_grad_packed` does 1 gather where
    :func:`bilinear_sample_grad` does 4.  Out-of-image taps are zero
    (zeros shift in at the last row/column).

    Exactness contract: for any point within the |coord| <= 0.99 validity
    bound the cell origin is strictly interior (0 <= x0 <= W-2, same for y),
    where packed and per-tap sampling agree bit-for-bit.  Outside the bound
    the two differ (packed clamps the cell), so callers must mask outputs by
    ``valid`` — exactly what the GN linearizations already do.
    """
    H, W, C = image.shape
    z_col = jnp.zeros((H, 1, C), image.dtype)
    z_row = jnp.zeros((1, W, C), image.dtype)
    right = jnp.concatenate([image[:, 1:], z_col], axis=1)
    down = jnp.concatenate([image[1:], z_row], axis=0)
    down_right = jnp.concatenate([down[:, 1:], z_col], axis=1)
    return jnp.concatenate([image, right, down, down_right], axis=-1)


def bilinear_sample_packed(
    packed: jax.Array, coords_norm: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """:func:`bilinear_sample` on a :func:`pack_bilinear_taps` image — one
    row-gather instead of four.  Same masking contract as the packed-grad
    variant: agrees with the unpacked sampler exactly on ``valid`` points."""
    samples, _, valid = bilinear_sample_grad_packed(packed, coords_norm)
    return samples, valid


def bilinear_cell_index(
    coords_norm: jax.Array, hw: tuple[int, int]
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Cell-origin row index + fractional weights + validity for a
    :func:`pack_bilinear_taps` image of shape ``hw`` — the gather-free half
    of :func:`bilinear_sample_grad_packed`.

    Returns (lin_idx (..., N) int32 into the (H*W, 4C)-flattened packed
    image, wx (..., N), wy (..., N), valid (..., N) bool).  Callers that
    sample MANY images in one dispatch can offset these indices into a
    single flattened pool and issue ONE gather for all of them: on TPU a
    single-pool gather runs ~2x faster than the same rows fetched as
    separate per-image gathers serialized under a scan (the gn_mapping
    linearization does exactly this)."""
    H, W = hw
    x = (coords_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (coords_norm[..., 1] + 1.0) * 0.5 * (H - 1)

    valid = jnp.all(jnp.abs(coords_norm) <= VALID_BOUND, axis=-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    return y0i * W + x0i, wx, wy, valid


def bilinear_grad_from_taps(
    taps: jax.Array, wx: jax.Array, wy: jax.Array, hw: tuple[int, int]
) -> tuple[jax.Array, jax.Array]:
    """Value + in-cell derivative from pre-gathered packed taps (..., 4C)
    and :func:`bilinear_cell_index` weights.  Returns (samples (..., C),
    dval_dcoord (..., C, 2)) — the post-gather half of
    :func:`bilinear_sample_grad_packed`."""
    H, W = hw
    C = taps.shape[-1] // 4
    v00 = taps[..., 0 * C : 1 * C]
    v01 = taps[..., 1 * C : 2 * C]
    v10 = taps[..., 2 * C : 3 * C]
    v11 = taps[..., 3 * C : 4 * C]
    wxc = wx[..., None].astype(taps.dtype)
    wyc = wy[..., None].astype(taps.dtype)
    return _lerp_and_grad(v00, v01, v10, v11, wxc, wyc, H, W)


def bilinear_sample_grad_packed(
    packed: jax.Array, coords_norm: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`bilinear_sample_grad` on a :func:`pack_bilinear_taps` image.

    Returns (samples (..., N, C), dval_dcoord (..., N, C, 2), valid (..., N)).
    Identical to the unpacked version for every point with ``valid`` True;
    out-of-bound points return clamped-cell values and MUST be masked by the
    caller (see the packing contract).
    """
    H, W, C4 = packed.shape
    idx, wx, wy, valid = bilinear_cell_index(coords_norm, (H, W))
    flat = packed.reshape(H * W, C4)
    taps = jnp.take(flat, idx, axis=0)                     # (..., N, 4C)
    samples, dval = bilinear_grad_from_taps(taps, wx, wy, (H, W))
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
