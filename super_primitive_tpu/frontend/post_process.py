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
from ..ops.connected_components import label_components, label_components_chunked


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
    with _stage("split_disc"):
        disc = depth_discontinuity_native(
            logdepth_perseg, regions, filter_size, depth_threshold
        )
    if disc is None:
        # device fallback: pad the segment axis to a multiple of 32 so the
        # jitted discontinuity kernel compiles once per ladder step, not once
        # per keyframe's exact N (each fresh shape is a 2-5 s remote compile
        # on the relay backend)
        cap = -(-N // 32) * 32
        ld_p = np.zeros((cap, H, W), np.float32)
        ld_p[:N] = logdepth_perseg
        rg_p = np.zeros((cap, H, W), bool)
        rg_p[:N] = regions
        disc = np.asarray(
            depth_discontinuity(
                jnp.asarray(ld_p), jnp.asarray(rg_p), filter_size,
                depth_threshold,
            )
        )[:N]
    # NOTE: CC must run on EVERY segment, not only the ones carrying disc
    # pixels — SAM masks can be inherently disconnected with zero depth
    # discontinuities, and splitting those is the point of the reference's
    # kf_fix_disconnected_regions (post_processer.py:160-181).  A
    # disc-subset shortcut was tried and reverted: it silently merged such
    # segments (segment counts dropped 68 -> 66 on the e2e workload).
    split_masks = regions & ~disc
    with _stage("split_cc"):
        labels = label_components_chunked(split_masks)

    out_masks, out_logdepth, out_kp = [], [], []
    min_px = area_keep_ratio * (H * W)
    part_ctx = _stage("split_parts")
    part_ctx.__enter__()
    for i in range(N):
        flat = labels[i].ravel()
        fg = flat[flat >= 0]
        if fg.size == 0:
            continue
        # labels are component-min linear indices in [0, H*W): bincount sizes
        # directly — never materialize the (K, H, W) one-hot for the tiny
        # noise parts (the disc split produces thousands of them)
        sizes = np.bincount(fg, minlength=H * W)
        kept_ids = np.nonzero(sizes > min_px)[0]
        if kept_ids.size == 0:
            continue
        if kept_ids.size == 1:
            out_masks.append(regions[i][None])
            out_logdepth.append(logdepth_perseg[i][None])
            out_kp.append(keypoints_rc[i][None])
        else:
            kept = labels[i][None] == kept_ids[:, None, None]  # (K', H, W)
            out_masks.append(kept)
            out_logdepth.append(
                np.broadcast_to(logdepth_perseg[i], kept.shape).copy()
            )
            kps = np.zeros((kept.shape[0], 2), keypoints_rc.dtype)
            for j in range(kept.shape[0]):
                rr, cc = np.nonzero(kept[j])
                k = rng.integers(0, rr.size)
                kps[j] = [rr[k], cc[k]]
            out_kp.append(kps)

    part_ctx.__exit__(None, None, None)
    if not out_masks:
        return regions, logdepth_perseg, keypoints_rc
    return (
        np.concatenate(out_masks, axis=0),
        np.concatenate(out_logdepth, axis=0),
        np.concatenate(out_kp, axis=0),
    )
