"""Segment post-processing: depth-discontinuity splitting.

Reference: frontend/segment/post_processer.py — detect depth discontinuities
per segment (max-pool the depth then Scharr-gradient threshold, :13-29),
erase discontinuity pixels, split the remainder into connected components
(:57-64 via cupy; here via the on-device labeler), keep parts above an area
ratio, and re-seed one keypoint per part (:110-157).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..image.gradients import scharr_gradients
from ..ops.connected_components import (
    label_components,
    label_components_chunked,
    label_components_native,
)


def max_pool2d_same(x: jax.Array, k: int) -> jax.Array:
    """Stride-1 max pool with same padding on (N, H, W)."""
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k), window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def depth_discontinuity(
    logdepth: jax.Array, validity: jax.Array, filter_size: int = 3, threshold: float = 0.1
) -> jax.Array:
    """post_processer.py:13-29: exp -> invalid=-1 -> maxpool -> Scharr
    magnitude > threshold, restricted to valid pixels."""
    depth = jnp.exp(logdepth)
    depth = jnp.where(validity, depth, -1.0)
    pooled = max_pool2d_same(depth, filter_size)
    gx, gy = scharr_gradients(pooled.transpose(1, 2, 0))
    grad = jnp.sqrt(gx**2 + gy**2).transpose(2, 0, 1)
    return (grad > threshold) & validity


_native_checked = False
_native_disc = None


def _native_disc_fn():
    """ctypes handle for the C++ depth-discontinuity kernel (csrc/cc.cpp);
    None when the native lib is unavailable."""
    global _native_checked, _native_disc
    if _native_checked:
        return _native_disc
    _native_checked = True
    try:
        import ctypes

        from ..data.native_loader import get_lib

        lib = get_lib()
        if lib:
            lib.sp_depth_discontinuity.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ]
            _native_disc = lib.sp_depth_discontinuity
    except Exception:
        _native_disc = None
    return _native_disc


def depth_discontinuity_native(
    logdepth: np.ndarray, validity: np.ndarray,
    filter_size: int = 3, threshold: float = 0.1,
    num_threads: int | None = None,
):
    """Host-native depth_discontinuity (same f32 semantics); None when the
    native lib is unavailable.  The split runs on host-resident masks whose
    output feeds a host part loop, so native host code beats a device
    round-trip (~21 MB upload + relay RTT) here."""
    import ctypes

    fn = _native_disc_fn()
    if fn is None:
        return None
    if num_threads is None:
        # match label_components_native: never oversubscribe the host cores
        import os

        num_threads = min(8, os.cpu_count() or 1)
    logdepth = np.ascontiguousarray(np.asarray(logdepth), np.float32)
    valid = np.ascontiguousarray(np.asarray(validity), np.uint8)
    N, H, W = logdepth.shape
    out = np.empty((N, H, W), np.uint8)
    fn(
        logdepth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        N, H, W, filter_size, ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), num_threads,
    )
    return out.astype(bool)


def split_disconnected_segments(
    regions: np.ndarray,
    logdepth_perseg: np.ndarray,
    keypoints_rc: np.ndarray,
    filter_size: int = 3,
    depth_threshold: float = 0.1,
    area_keep_ratio: float = 1e-3,
    rng: np.random.Generator | None = None,
    timer=None,
):
    """Full kf_fix_disconnected_regions (post_processer.py:160-181).

    Returns new (regions, logdepth_perseg, keypoints_rc) with split segments.
    Keypoint re-seeding samples a random in-part pixel (reference
    sample_pts_in_mask, :67-84); single-part segments keep their original
    mask and keypoint (:138-141).
    """
    import contextlib

    def _stage(name):
        return timer.stage(name) if timer is not None else contextlib.nullcontext()

    rng = rng or np.random.default_rng(0)
    N, H, W = regions.shape

    # NOTE: CC must run on EVERY segment, not only the ones carrying disc
    # pixels — SAM masks can be inherently disconnected with zero depth
    # discontinuities, and splitting those is the point of the reference's
    # kf_fix_disconnected_regions (post_processer.py:160-181).  A
    # disc-subset shortcut was tried and reverted: it silently merged such
    # segments (segment counts dropped 68 -> 66 on the e2e workload).
    #
    # Both kernels run per segment on the bbox crop: at the reference's
    # odom scale (480x640 keyframes, 200-300 segments) the full-frame
    # stacks are 66M px / ~330 MB of traffic, measured at 10-17 s of the
    # keyframe add on a 1-core host, while the summed bbox area is ~5-10%
    # of that.  The crop is exact: both kernels have a 2-px dependency
    # radius (3x3 maxpool + 3x3 Scharr), validity is zero outside the
    # bbox, and components cannot leave their own mask — see the margin
    # arithmetic below.
    native_ok = _native_disc_fn() is not None
    if native_ok:
        # per-segment bboxes from axis-any reductions (vectorized)
        rows_any = regions.any(axis=2)  # (N, H)
        cols_any = regions.any(axis=1)  # (N, W)
        r0 = rows_any.argmax(axis=1)
        r1 = H - rows_any[:, ::-1].argmax(axis=1)  # exclusive
        c0 = cols_any.argmax(axis=1)
        c1 = W - cols_any[:, ::-1].argmax(axis=1)
        empty = ~rows_any.any(axis=1)

        m = filter_size // 2 + 1  # kernel dependency radius (maxpool+Scharr)
        disc_crops = [None] * N
        with _stage("split_disc"):
            for i in range(N):
                if empty[i]:
                    continue
                # expand by the dependency radius and clamp to the frame:
                # inside the clamp the crop sees the exact full-frame inputs
                # (validity 0 -> depth -1 beyond the bbox); at the frame
                # edge reflect-padding matches the full-frame computation
                er0, er1 = max(int(r0[i]) - m, 0), min(int(r1[i]) + m, H)
                ec0, ec1 = max(int(c0[i]) - m, 0), min(int(c1[i]) + m, W)
                d = depth_discontinuity_native(
                    np.ascontiguousarray(
                        logdepth_perseg[i : i + 1, er0:er1, ec0:ec1]
                    ),
                    np.ascontiguousarray(regions[i : i + 1, er0:er1, ec0:ec1]),
                    filter_size, depth_threshold,
                )[0]
                # cut back to the bbox (drops the margin ring, whose values
                # can differ from full-frame; bbox pixels are >= m from the
                # crop edge wherever the edge is interior)
                disc_crops[i] = (
                    d[int(r0[i]) - er0 : int(r1[i]) - er0,
                      int(c0[i]) - ec0 : int(c1[i]) - ec0],
                    int(r0[i]), int(c0[i]),
                )
        with _stage("split_cc"):
            labels_crops = [None] * N
            for i in range(N):
                if disc_crops[i] is None:
                    continue
                d, rr0, cc0 = disc_crops[i]
                reg_c = regions[i, rr0 : rr0 + d.shape[0], cc0 : cc0 + d.shape[1]]
                lab = label_components_native(
                    np.ascontiguousarray((reg_c & ~d)[None])
                )
                labels_crops[i] = lab[0]  # (hb, wb) crop labels
    else:
        # device fallback (no native lib): pad the segment axis to a
        # multiple of 32 so the jitted discontinuity kernel compiles once
        # per ladder step, not once per keyframe's exact N (each fresh
        # shape is a 2-5 s remote compile on the relay backend)
        cap = -(-N // 32) * 32
        ld_p = np.zeros((cap, H, W), np.float32)
        ld_p[:N] = logdepth_perseg
        rg_p = np.zeros((cap, H, W), bool)
        rg_p[:N] = regions
        with _stage("split_disc"):
            disc = np.asarray(
                depth_discontinuity(
                    jnp.asarray(ld_p), jnp.asarray(rg_p), filter_size,
                    depth_threshold,
                )
            )[:N]
        with _stage("split_cc"):
            labels = label_components_chunked(regions & ~disc)
        labels_crops = [
            labels[i] if regions[i].any() else None for i in range(N)
        ]
        r0 = np.zeros(N, np.int64)
        c0 = np.zeros(N, np.int64)

    min_px = area_keep_ratio * (H * W)
    part_ctx = _stage("split_parts")
    part_ctx.__enter__()
    parts = []  # (src i, None = single part, else (crop labels, kept_ids))
    for i in range(N):
        lab = labels_crops[i]
        if lab is None:
            continue
        flat = lab.ravel()
        fg = flat[flat >= 0]
        if fg.size == 0:
            continue
        # labels are component-min linear indices within the crop: bincount
        # sizes directly — never materialize the (K, H, W) one-hot for the
        # tiny noise parts (the disc split produces thousands of them)
        sizes = np.bincount(fg, minlength=flat.size)
        kept_ids = np.nonzero(sizes > min_px)[0]
        if kept_ids.size == 0:
            continue
        parts.append((i, None if kept_ids.size == 1 else (lab, kept_ids)))

    n_out = sum(1 if k is None else len(k[1]) for _, k in parts)
    if n_out == N and all(kind is None for _, kind in parts):
        # nothing split, nothing dropped: skip the (N, H, W) output
        # assembly entirely (~440 MB of copies at odom scale)
        part_ctx.__exit__(None, None, None)
        return regions, logdepth_perseg, keypoints_rc
    out_masks = np.zeros((n_out, H, W), bool)
    out_kp = np.zeros((n_out, 2), keypoints_rc.dtype)
    src_idx = np.zeros(n_out, np.int64)
    j = 0
    for i, kind in parts:
        src_i0, src_c0 = (int(r0[i]), int(c0[i])) if native_ok else (0, 0)
        if kind is None:
            out_masks[j] = regions[i]
            out_kp[j] = keypoints_rc[i]
            src_idx[j] = i
            j += 1
            continue
        lab, kept_ids = kind
        hb, wb = lab.shape
        for cid in kept_ids:
            part = lab == cid
            out_masks[j, src_i0 : src_i0 + hb, src_c0 : src_c0 + wb] = part
            rr, cc = np.nonzero(part)
            k = rng.integers(0, rr.size)
            out_kp[j] = [rr[k] + src_i0, cc[k] + src_c0]
            src_idx[j] = i
            j += 1
    part_ctx.__exit__(None, None, None)
    if n_out == 0:
        return regions, logdepth_perseg, keypoints_rc
    return out_masks, np.take(logdepth_perseg, src_idx, axis=0), out_kp
