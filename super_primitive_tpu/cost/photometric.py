"""Dense photometric reprojection cost — the optimization hot loop.

Re-derivation of the reference pipeline (core/dense_optim.py:265-363,
core/dense_optim_batch.py:50-147) over the fixed-shape :class:`PointBundle`:

  1. spread each segment's scalar log-depth shift over its frozen per-point
     log-depths (``infer_depth_seeds``, dense_optim.py:38-80);
  2. exp -> depth; unproject bundle pixels with geometry K;
  3. transform into the target frame (pose = T_target_from_source);
  4. project with K, normalize by *geometry* dims, bilinear-sample the
     (possibly coarser) target pyramid image — normalized coords make the
     sampling resolution-independent (geo_down=False semantics);
  5. optional affine brightness compensation exp(-(a_t - a_s)) * rgb + (b_t - b_s)
     on RGB channels (dense_optim.py:202-225);
  6. masked L1, *mean over channels x total region points* — padding excluded
     from numerator AND denominator so the value equals the reference's
     ragged ``.mean(dim=[1, 2])`` (dense_optim.py:249-253) exactly.

Source-pixel sampling is hoisted: project(unproject(uv, z)) == uv for any z,
so source samples and validity are pose/depth-independent and computed once
per pyramid level (the reference recomputes them every iteration except in
tracking, odometery.py:365-369 — hoisting is pure win, same numerics).

Everything is shape-static: jit once per (capacity, level-shape) pair.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import projection
from ..keyframe import PointBundle, SegmentGeometry
from ..ops.sampling import bilinear_sample, bilinear_sample_packed, pack_bilinear_taps

# The reference uses z > 1e-7 in the single-target path (dense_optim.py:146)
# and z > 1e-6 in the batched path (dense_optim_batch.py:15); we keep both.
Z_VALID_SINGLE = 1e-7
Z_VALID_BATCH = 1e-6


class SourceSamples(NamedTuple):
    """Per-level precomputed source-image samples (pose/depth independent)."""

    pixels: jax.Array   # (P, C)
    valid: jax.Array    # (P,) bool — |coord| <= 0.99 & bundle validity


@jax.custom_vjp
def _spread_gather(shift: jax.Array, seg_id: jax.Array) -> jax.Array:
    """shift (N,)[seg_id] with an MXU-friendly VJP.

    The gather's default transpose is a scatter-add of P point-cotangents
    into N segment bins, which serializes on TPU; the one-hot contraction
    computes the same segment-sum on the MXU (the trick the GN landmark
    reductions use, solve/gn_mapping.py:315-322).  The one-hot is built
    from loop-invariant ``seg_id``, so XLA hoists it out of optimizer
    loops."""
    return shift[seg_id]


def _spread_gather_fwd(shift, seg_id):
    return shift[seg_id], (seg_id, shift.shape[-1])


def _spread_gather_bwd(res, g):
    import numpy as _np

    seg_id, n = res
    onehot = (jnp.arange(n)[:, None] == seg_id[None, :]).astype(g.dtype)
    g_shift = jnp.einsum(
        "np,...p->...n", onehot, g, precision=jax.lax.Precision.HIGHEST
    )
    return g_shift, _np.zeros(seg_id.shape, dtype=jax.dtypes.float0)


_spread_gather.defvjp(_spread_gather_fwd, _spread_gather_bwd)


def spread_logdepth(
    bundle: PointBundle, kp_logdepth: jax.Array, kp_base_logdepth: jax.Array
) -> jax.Array:
    """Per-point log-depth from per-segment scalars (infer_depth_seeds,
    core/dense_optim.py:38-80): base + (kp_logdepth - kp_base_logdepth)[seg]."""
    shift = kp_logdepth - kp_base_logdepth
    return bundle.base_logdepth + _spread_gather(shift, bundle.seg_id)


def normalized_image_coords(uv: jax.Array, geo_dims: tuple[int, int]) -> jax.Array:
    """(u, v) pixel coords at geometry resolution -> [-1, 1] normalized (x, y)
    using align_corners=True over (W, H) (dense_optim.py:150-157)."""
    H, W = geo_dims
    dims = jnp.asarray([W - 1, H - 1], dtype=jnp.float32)
    return 2.0 * uv / dims - 1.0


def precompute_source(
    image: jax.Array, bundle: PointBundle, geo_dims: tuple[int, int]
) -> SourceSamples:
    """Sample the source pyramid image at bundle pixels (constant during
    optimization; cf. odometery.py:365-369 precompute path)."""
    coords = normalized_image_coords(bundle.uv, geo_dims)
    pixels, valid = bilinear_sample(image, coords)
    return SourceSamples(pixels=pixels, valid=valid & bundle.valid)


def affine_compensate(
    trg_pixels: jax.Array, src_affine: jax.Array, trg_affine: jax.Array
) -> jax.Array:
    """Affine brightness model on RGB channels (dense_optim.py:202-225):
    rgb' = exp(-(a_t - a_s)) * rgb + (b_t - b_s).  Leading batch dims of the
    affine parameters broadcast over points."""
    a = (trg_affine[..., 0] - src_affine[..., 0])[..., None, None]
    b = (trg_affine[..., 1] - src_affine[..., 1])[..., None, None]
    rgb = jnp.exp(-a) * trg_pixels[..., :3] + b
    return jnp.concatenate([rgb, trg_pixels[..., 3:]], axis=-1)


def masked_l1_mean(
    src_pixels: jax.Array,
    trg_pixels: jax.Array,
    full_mask: jax.Array,
    num_valid: jax.Array,
) -> jax.Array:
    """Reference residual reduction (dense_optim.py:248-253): L1 of masked
    difference, mean over channels AND all region points (masked-out points
    count in the denominator, padding does not)."""
    C = src_pixels.shape[-1]
    diff = jnp.abs((src_pixels - trg_pixels) * full_mask[..., None])
    return jnp.sum(diff, axis=(-2, -1)) / (C * jnp.maximum(num_valid, 1))


def photometric_cost(
    bundle: PointBundle,
    src: SourceSamples,
    trg_image: jax.Array,
    K: jax.Array,
    geo_dims: tuple[int, int],
    kp_logdepth: jax.Array,
    kp_base_logdepth: jax.Array,
    pose: jax.Array,
    affine: Optional[tuple[jax.Array, jax.Array]] = None,
    mode: str = "colour",
    return_aux: bool = False,
):
    """Single-target photometric cost (core/dense_optim.py:265-363).

    ``pose`` is T_target_from_source (4, 4).  Returns a scalar residual
    (mean over channels x region points), optionally with aux arrays for
    visualization/diagnostics.  ``mode`` selects the channel split when
    normal channels are appended (cost/normal_modes.py); the cosine residual
    term is zero as in the reference (dense_optim.py:241-261).
    """
    logd = spread_logdepth(bundle, kp_logdepth, kp_base_logdepth)
    z = jnp.exp(logd)
    pts = projection.unproject(bundle.uv, z, K)
    pts_t = projection.transform(pts, pose)

    uv_t = projection.project(pts_t, K)
    coords = normalized_image_coords(uv_t, geo_dims)
    # packed taps: ONE row-gather per point instead of four (the gathers are
    # the latency wall of the whole cost).  The pack is loop-invariant, so
    # XLA hoists it out of optimizer while_loops; every consumed quantity is
    # masked by validity, where packed == per-tap sampling exactly.
    trg_pixels, trg_valid = bilinear_sample_packed(
        pack_bilinear_taps(trg_image), coords
    )
    trg_valid = trg_valid & (jax.lax.stop_gradient(pts_t[..., 2]) > Z_VALID_SINGLE)

    if affine is not None:
        trg_pixels = affine_compensate(trg_pixels, affine[0], affine[1])

    src_pixels = src.pixels
    if mode == "colour":
        # the reference ALWAYS slices the affine channels for colour mode
        # (core/cost_utils.py:4-8) — with include_normals the image carries
        # extra channels that must not enter the photometric residual
        src_pixels = src_pixels[..., :3]
        trg_pixels = trg_pixels[..., :3]
    else:
        from .normal_modes import split_by_mode, transform_normals

        src_pixels = transform_normals(src_pixels, pose, mode)
        src_pixels = split_by_mode(src_pixels, mode)[0]
        trg_pixels_aff = split_by_mode(trg_pixels, mode)[0]
        if src_pixels is None:  # norm_kappa: affine term is 0 (reference
            zero = jnp.zeros(())  # dense_optim.py:241-261 leaves it zero)
            return (zero, {}) if return_aux else zero
        trg_pixels = trg_pixels_aff

    full_mask = (src.valid & trg_valid).astype(trg_pixels.dtype)
    residual = masked_l1_mean(src_pixels, trg_pixels, full_mask, bundle.num_valid)
    if not return_aux:
        return residual
    aux = {
        "points_src": pts,
        "points_trg": pts_t,
        "trg_pixels": trg_pixels,
        "full_mask": full_mask,
        "residual_raw": (src_pixels - trg_pixels) * full_mask[..., None],
    }
    return residual, aux


def photometric_cost_batch(
    bundle: PointBundle,
    src: SourceSamples,
    trg_images: jax.Array,
    K: jax.Array,
    geo_dims: tuple[int, int],
    kp_logdepth: jax.Array,
    kp_base_logdepth: jax.Array,
    poses: jax.Array,
    affine: Optional[tuple[jax.Array, jax.Array]] = None,
):
    """Batched cost: one source keyframe vs B stacked targets
    (core/dense_optim_batch.py:50-147).  ``trg_images`` is (B, H, W, C),
    ``poses`` is (B, 4, 4); returns per-target residuals (B,)."""
    logd = spread_logdepth(bundle, kp_logdepth, kp_base_logdepth)
    z = jnp.exp(logd)
    pts = projection.unproject(bundle.uv, z, K)

    def per_target(trg_image, pose, trg_affine):
        pts_t = projection.transform(pts, pose)
        uv_t = projection.project(pts_t, K)
        coords = normalized_image_coords(uv_t, geo_dims)
        # single-gather packed taps (see photometric_cost); hoisted per solve
        trg_pixels, trg_valid = bilinear_sample_packed(
            pack_bilinear_taps(trg_image), coords
        )
        trg_valid = trg_valid & (jax.lax.stop_gradient(pts_t[..., 2]) > Z_VALID_BATCH)
        if affine is not None:
            trg_pixels = affine_compensate(trg_pixels, affine[0], trg_affine)
        full_mask = (src.valid & trg_valid).astype(trg_pixels.dtype)
        # colour mode: RGB channels only (cost_utils.py:4-8)
        return masked_l1_mean(
            src.pixels[..., :3], trg_pixels[..., :3], full_mask, bundle.num_valid
        )

    if affine is not None:
        return jax.vmap(per_target)(trg_images, poses, affine[1])
    return jax.vmap(per_target, in_axes=(0, 0, None))(trg_images, poses, None)
