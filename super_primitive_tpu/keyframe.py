"""KeyFrame as a JAX pytree + the fixed-shape PointBundle hot-path structure.

Reference semantics (image/keyframe.py:20-74): a keyframe holds an image, the
geometry intrinsics ``K`` (kept at geometry resolution at every pyramid
level: geo_down=False, :135-141), display intrinsics ``K_img``, and — for
non-supporting frames — per-segment frozen log-depth maps (N, Hg, Wg),
keypoints (N, 2) normalized (row, col), and boolean segment regions
(N, Hg, Wg).

TPU-first redesign ("raggedness under XLA", SURVEY §7.3.1):

  The reference extracts ragged point lists with ``torch.where(masks)`` every
  optimizer iteration (core/dense_optim.py:89-114).  Region masks are
  *constant* during optimization, so we extract ONCE per keyframe into a
  fixed-capacity :class:`PointBundle` — flat arrays of pixel coords, segment
  ids and frozen per-point log-depths, padded to a static capacity with a
  validity mask.  Every optimizer iteration is then dense fixed-shape math:
  gather the per-segment scalar shift, exp, unproject, transform, project,
  bilinear-sample, masked reduce.  No recompilation, no dynamic shapes.

  The masked *mean* keeps the reference's denominator: channels x total
  region points (padding excluded), matching ``.mean(dim=[1,2])`` over the
  ragged (1, C, num_pts) tensor (core/dense_optim.py:249-253).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .geometry.coords import denormalize_coords, normalize_coords
from .image import pyramid as pyr


class SegmentGeometry(struct.PyTreeNode):
    """Per-segment frozen geometry, padded to a static segment capacity N.

    Invalid (padding) segments have ``seg_valid=False``, empty regions and
    zero logdepth.
    """

    keypoints: jax.Array        # (N, 2) normalized (row, col) in [-1, 1]
    logdepth: jax.Array         # (N, Hg, Wg) frozen log-depth (0 outside region)
    regions: jax.Array          # (N, Hg, Wg) bool
    seg_valid: jax.Array        # (N,) bool

    @property
    def num_segments(self) -> int:
        return self.keypoints.shape[0]

    @property
    def geo_dims(self) -> tuple[int, int]:
        return self.logdepth.shape[1], self.logdepth.shape[2]

    def keypoint_pixels(self) -> jax.Array:
        """Denormalized integer keypoint (row, col) pixels (N, 2)."""
        H, W = self.geo_dims
        return denormalize_coords(self.keypoints, jnp.asarray([H, W], jnp.float32))

    def keypoint_base_logdepth(self) -> jax.Array:
        """Frozen log-depth at each segment's keypoint pixel (N,).

        The reference reads ``logdepth_perseg[b, x, y]`` at denormalized
        keypoints (core/dense_optim.py:51-61).
        """
        rc = self.keypoint_pixels()
        n = jnp.arange(self.num_segments)
        return self.logdepth[n, rc[:, 0], rc[:, 1]]


class PointBundle(struct.PyTreeNode):
    """Flattened region pixels of one keyframe, padded to static capacity P.

    ``num_valid`` is the true region-point count — the reference's residual
    denominator (its ragged tensors have exactly this many columns).
    """

    uv: jax.Array               # (P, 2) float32, (u, v) = (col, row)
    seg_id: jax.Array           # (P,) int32 (0 for padding)
    base_logdepth: jax.Array    # (P,) float32 frozen log-depth at the pixel
    valid: jax.Array            # (P,) bool — False for padding
    num_valid: jax.Array        # () int32

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


class KeyFrame(struct.PyTreeNode):
    """One frame: image + intrinsics (+ segment geometry unless supporting).

    ``image`` is (H, W, C) channels-last float32 in [0, 1]; extra channels
    beyond RGB carry predicted normals when enabled (reference
    frontend/process_frame.py:191-205).
    """

    image: jax.Array
    K: jax.Array                              # geometry intrinsics (3, 3)
    K_img: jax.Array                          # image/display intrinsics (3, 3)
    geo: Optional[SegmentGeometry] = None
    frame_id: Optional[int] = struct.field(pytree_node=False, default=None)

    @property
    def is_supporting(self) -> bool:
        return self.geo is None

    @property
    def geo_dims(self) -> tuple[int, int]:
        assert self.geo is not None
        return self.geo.geo_dims


@dataclasses.dataclass
class KeyFramePyramid:
    """Coarse-to-fine image pyramid of one keyframe.

    Geometry is shared across levels (geo_down=False semantics,
    image/keyframe.py:135-141): only images and K_img shrink; ``K`` and the
    point bundle stay at geometry resolution.  Sampling uses normalized
    coordinates, which are resolution-independent, so the same bundle drives
    every level.
    """

    images: list[jax.Array]       # coarsest-first
    Ks_img: list[jax.Array]       # coarsest-first
    K: jax.Array
    geo: Optional[SegmentGeometry]
    bundle: Optional[PointBundle]

    @property
    def num_levels(self) -> int:
        return len(self.images)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_bundle_np(
    regions: np.ndarray,
    logdepth: np.ndarray,
    capacity: Optional[int] = None,
    pad_multiple: int = 1024,
) -> PointBundle:
    """Extract the point bundle on host (runs once per keyframe, off the hot
    path — the device-side equivalent of core/dense_optim.py:89-114).

    Points are ordered (seg, row, col) lexicographically like
    ``torch.where``; coords become (u, v) = (col, row) as in the reference's
    ``stack([y, x])`` (core/dense_optim.py:103-109).
    """
    regions = np.asarray(regions)
    logdepth = np.asarray(logdepth)
    b, r, c = np.nonzero(regions)
    n = b.shape[0]
    cap = capacity if capacity is not None else round_up(max(n, 1), pad_multiple)
    if n > cap:
        raise ValueError(f"bundle capacity {cap} < {n} region points")

    uv = np.zeros((cap, 2), np.float32)
    uv[:n, 0] = c
    uv[:n, 1] = r
    seg_id = np.zeros((cap,), np.int32)
    seg_id[:n] = b
    base = np.zeros((cap,), np.float32)
    base[:n] = logdepth[b, r, c]
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return PointBundle(
        uv=jnp.asarray(uv),
        seg_id=jnp.asarray(seg_id),
        base_logdepth=jnp.asarray(base),
        valid=jnp.asarray(valid),
        num_valid=jnp.asarray(n, jnp.int32),
    )


def build_bundle(geo: SegmentGeometry, capacity: int) -> PointBundle:
    """On-device bundle extraction with a static capacity (jit-compatible).

    Uses a stable counting-sort formulation: rank = cumsum of the flattened
    region mask, scatter points to their rank.  Order matches
    :func:`build_bundle_np` (seg-major, row, col).
    """
    N, H, W = geo.regions.shape
    flat = geo.regions.reshape(-1)
    idx = jnp.cumsum(flat.astype(jnp.int32)) - 1  # rank of each set bit
    n = jnp.sum(flat.astype(jnp.int32))

    lin = jnp.arange(N * H * W, dtype=jnp.int32)
    seg = lin // (H * W)
    row = (lin % (H * W)) // W
    col = lin % W

    tgt = jnp.where(flat, idx, capacity)  # padding scatters to overflow slot
    uv = jnp.zeros((capacity + 1, 2), jnp.float32)
    uv = uv.at[tgt].set(jnp.stack([col, row], axis=-1).astype(jnp.float32), mode="drop")
    seg_id = jnp.zeros((capacity + 1,), jnp.int32).at[tgt].set(seg, mode="drop")
    base = jnp.zeros((capacity + 1,), jnp.float32).at[tgt].set(
        geo.logdepth.reshape(-1), mode="drop"
    )
    # overflow points (n > capacity) are dropped by the scatter; clamp the
    # count so the masked-mean denominator stays consistent with the points
    # that actually contribute (build_bundle_np raises instead)
    n = jnp.minimum(n, capacity)
    valid = jnp.arange(capacity) < n
    return PointBundle(
        uv=uv[:capacity],
        seg_id=seg_id[:capacity],
        base_logdepth=base[:capacity],
        valid=valid,
        num_valid=n,
    )


def keyframe_pyramid(
    kf: KeyFrame,
    start_level: int,
    end_level: int,
    bundle: Optional[PointBundle] = None,
    bundle_capacity: Optional[int] = None,
    use_grayscale: bool = False,
) -> KeyFramePyramid:
    """Build the coarse-to-fine pyramid (reference image/keyframe.py:77-148,
    geo_down=False): images blurred+downsampled per level, K_img rescaled,
    geometry shared at base resolution."""
    image = kf.image
    if use_grayscale:
        image = pyr.grayscale(image)
    images = pyr.image_pyramid(image, start_level, end_level)
    Ks_img = pyr.intrinsics_pyramid(kf.K_img, start_level, end_level)
    if bundle is None and kf.geo is not None:
        cap = bundle_capacity
        if cap is None:
            H, W = kf.geo.geo_dims
            cap = round_up(2 * H * W, 1024)
        bundle = build_bundle(kf.geo, cap)
    return KeyFramePyramid(images=images, Ks_img=Ks_img, K=kf.K, geo=kf.geo, bundle=bundle)


def put_keypoints_back(
    keypoints: np.ndarray, regions: np.ndarray, logdepth: Optional[np.ndarray] = None
):
    """Snap keypoints to the nearest valid region pixel and drop empty
    segments (host-side, once per keyframe; reference image/keyframe.py:151-172).

    Vectorized over segments instead of the reference's per-keypoint device
    loop (a noted slow spot, SURVEY §2.4).
    """
    keypoints = np.asarray(keypoints)
    regions = np.asarray(regions).astype(bool)
    N, H, W = regions.shape
    dims = np.asarray([H, W], np.float32)
    kp_px = np.round(0.5 * (dims - 1.0) * (keypoints + 1.0)).astype(np.int64)

    good = regions.reshape(N, -1).sum(axis=1) > 0
    kp_px = kp_px[good]
    regions = regions[good]
    if logdepth is not None:
        logdepth = np.asarray(logdepth)[good]

    # fast path: keypoints already inside their region (the common case —
    # selection samples keypoints in masks) need no search; only misses pay
    # a nearest-valid-pixel argmin, restricted to the region's own pixels.
    # Tie-breaking matches the former full-image argmin (first row-major).
    M = kp_px.shape[0]
    out = kp_px.copy()
    in_mask = regions[np.arange(M), kp_px[:, 0], kp_px[:, 1]] if M else np.zeros(0, bool)
    for i in np.nonzero(~in_mask)[0]:
        rr, cc = np.nonzero(regions[i])
        d2 = (rr - kp_px[i, 0]) ** 2 + (cc - kp_px[i, 1]) ** 2
        j = int(np.argmin(d2))
        out[i] = rr[j], cc[j]
    new_kp = (2.0 * out / (dims - 1.0) - 1.0).astype(np.float32)
    if logdepth is not None:
        return new_kp, regions, logdepth
    return new_kp, regions


def make_segment_geometry(
    keypoints: np.ndarray,
    regions: np.ndarray,
    logdepth: np.ndarray,
    num_segments_cap: Optional[int] = None,
) -> SegmentGeometry:
    """Pack host-side per-segment arrays into a (optionally padded)
    SegmentGeometry pytree."""
    keypoints = np.asarray(keypoints, np.float32)
    regions = np.asarray(regions, bool)
    logdepth = np.asarray(logdepth, np.float32)
    n = keypoints.shape[0]
    cap = num_segments_cap if num_segments_cap is not None else n
    if n > cap:
        raise ValueError(f"segment capacity {cap} < {n}")
    H, W = regions.shape[1:]

    kp = np.zeros((cap, 2), np.float32)
    kp[:n] = keypoints
    reg = np.zeros((cap, H, W), bool)
    reg[:n] = regions
    ld = np.zeros((cap, H, W), np.float32)
    ld[:n] = logdepth * regions  # zero outside regions, as in the frontend
    sv = np.zeros((cap,), bool)
    sv[:n] = True
    return SegmentGeometry(
        keypoints=jnp.asarray(kp),
        logdepth=jnp.asarray(ld),
        regions=jnp.asarray(reg),
        seg_valid=jnp.asarray(sv),
    )
