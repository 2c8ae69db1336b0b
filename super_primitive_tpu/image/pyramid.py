"""Gaussian image pyramid with exact reference semantics, channels-last.

Reference: image/gaussian_pyramid.py —
  - blur kernel is the 3x3 binomial [[1,2,1],[2,4,2],[1,2,1]]/16 with reflect
    padding (:53-66);
  - a pyramid over levels [start, end) downsamples by stride-2 slices of the
    blurred image (:77-85) and returns the list **coarsest-first** (:82-84);
  - depth/mask pyramids use nearest-neighbor [0::2, 0::2] (:14) — no blur;
  - the intrinsics pyramid rescales K by 2^-i per level (:105-119) with the
    convention of resize_intrinsics (:42-50).

TPU-first: the blur is 9 shifted adds (XLA fuses to a tiny stencil; exact in
fp32, no conv-algorithm ambiguity). Images are (H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projection import scale_intrinsics


def binomial_blur(image: jax.Array) -> jax.Array:
    """3x3 binomial blur with reflect padding on an (H, W, C) image."""
    p = jnp.pad(image, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    H, W = image.shape[0], image.shape[1]

    def s(dy, dx):
        return jax.lax.dynamic_slice(p, (dy, dx, 0), (H, W, image.shape[2]))

    out = (
        1.0 * s(0, 0) + 2.0 * s(0, 1) + 1.0 * s(0, 2)
        + 2.0 * s(1, 0) + 4.0 * s(1, 1) + 2.0 * s(1, 2)
        + 1.0 * s(2, 0) + 2.0 * s(2, 1) + 1.0 * s(2, 2)
    )
    return out * (1.0 / 16.0)


def image_pyramid(image: jax.Array, start_level: int, end_level: int) -> list[jax.Array]:
    """Blur-downsample pyramid of an (H, W, C) image, list coarsest-first.

    Level i has scale 2^-i; levels in [start_level, end_level) are returned as
    [level_{end-1}, ..., level_start] to match the reference's iteration
    order (image/gaussian_pyramid.py:77-85).
    """
    pyr = []
    x = image
    for i in range(end_level - 1):
        if i >= start_level:
            pyr.insert(0, x)
        x = binomial_blur(x)[0::2, 0::2]
    pyr.insert(0, x)
    return pyr


def nn_downsample_pyramid(x: jax.Array, start_level: int, end_level: int) -> list[jax.Array]:
    """Nearest-neighbor pyramid ([0::2, 0::2] per level) for depth/masks.

    ``x`` has spatial dims first: (..., H, W) works via trailing-dim slicing
    on the first two spatial axes of an (H, W, ...) array — here we take
    (H, W, ...) layout.
    """
    pyr = []
    for i in range(end_level - 1):
        if i >= start_level:
            pyr.insert(0, x)
        x = x[0::2, 0::2]
    pyr.insert(0, x)
    return pyr


def intrinsics_pyramid(K: jax.Array, start_level: int, end_level: int) -> list[jax.Array]:
    """Per-level intrinsics, coarsest-first (image/gaussian_pyramid.py:105-119)."""
    pyr = []
    for i in range(start_level, end_level):
        s = 2.0 ** (-i)
        pyr.insert(0, scale_intrinsics(K, (s, s)))
    return pyr


def average_pool2(x: jax.Array) -> jax.Array:
    """2x2 average pooling on (H, W, ...) — the reference's 'bilinear' depth
    mode (image/gaussian_pyramid.py:11-12)."""
    H2, W2 = x.shape[0] // 2, x.shape[1] // 2
    x = x[: H2 * 2, : W2 * 2]
    return 0.25 * (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2])


def _windows2(x: jax.Array):
    """The four 2x2-window corners of an (H, W, ...) array (truncating odd
    trailing rows/cols like torch's pool ops)."""
    H2, W2 = x.shape[0] // 2, x.shape[1] // 2
    x = x[: H2 * 2, : W2 * 2]
    return x[0::2, 0::2], x[0::2, 1::2], x[1::2, 0::2], x[1::2, 1::2]


def pool_depth2(x: jax.Array, mode: str) -> jax.Array:
    """One 2x downsampling step of a depth map, all reference modes.

    Reference image/gaussian_pyramid.py:8-29 (`pyr_depth`, kernel_size=2):
      - 'bilinear'          -> 2x2 average pool
      - 'nearest_neighbor'  -> [0::2, 0::2] subsample
      - 'max' / 'min'       -> 2x2 max / min pool
      - 'masked_bilinear'   -> mean over non-NaN entries per 2x2 window;
                               all-NaN windows become 0.0 (`:20-26`)

    Only 'nearest_neighbor' is constructed at reference runtime
    (image/keyframe.py:94-100); the rest are config surface, kept for
    parity. Input is (H, W, ...) with spatial dims first.
    """
    if mode == "nearest_neighbor":
        return x[0::2, 0::2]
    if mode == "bilinear":
        return average_pool2(x)
    a, b, c, d = _windows2(x)
    if mode == "max":
        return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    if mode == "min":
        return jnp.minimum(jnp.minimum(a, b), jnp.minimum(c, d))
    if mode == "masked_bilinear":
        vs = [jnp.logical_not(jnp.isnan(w)) for w in (a, b, c, d)]
        num = sum(jnp.where(v, w, 0.0) for v, w in zip(vs, (a, b, c, d)))
        den = sum(v.astype(x.dtype) for v in vs)
        return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)
    raise ValueError(f"pool_depth2 mode {mode!r} is not implemented.")


def depth_pyramid(
    x: jax.Array, start_level: int, end_level: int, mode: str = "nearest_neighbor"
) -> list[jax.Array]:
    """Depth pyramid over levels [start, end), coarsest-first, in any of the
    reference's pyr_depth modes (generalizes :func:`nn_downsample_pyramid`)."""
    pyr = []
    for i in range(end_level - 1):
        if i >= start_level:
            pyr.insert(0, x)
        x = pool_depth2(x, mode)
    pyr.insert(0, x)
    return pyr


def grayscale(image: jax.Array) -> jax.Array:
    """ITU-R 601 luma of an (H, W, 3) image -> (H, W, 1), matching
    torchvision's Grayscale used at image/keyframe.py:104-106."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=image.dtype)
    return jnp.sum(image[..., :3] * w, axis=-1, keepdims=True)
