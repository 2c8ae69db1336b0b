"""Shared synthetic scene builders for tests: textured plane viewed from two
poses, segment grid, exact target rendering by inverse warp."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.geometry import projection
from super_primitive_tpu.keyframe import (
    KeyFrame,
    build_bundle_np,
    make_segment_geometry,
)
from super_primitive_tpu.lie import se3
from super_primitive_tpu.ops.sampling import sample_at_pixels


def smooth_texture(H, W, C=3):
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    chans = [
        np.sin(u * 0.2) * 0.5 + 0.5,
        np.cos(v * 0.25) * 0.5 + 0.5,
        (u + v) * (0.5 / (H + W)),
    ]
    return np.stack(chans[:C], -1).astype(np.float32)


def segment_grid(H, W, rows=2, cols=2, margin=4):
    """Non-overlapping rectangular segments + center keypoints."""
    N = rows * cols
    regions = np.zeros((N, H, W), bool)
    kp_px = np.zeros((N, 2), np.float32)
    hs, ws = (H - 2 * margin) // rows, (W - 2 * margin) // cols
    i = 0
    for r in range(rows):
        for c in range(cols):
            r0 = margin + r * hs
            c0 = margin + c * ws
            regions[i, r0 : r0 + hs - 2, c0 : c0 + ws - 2] = True
            kp_px[i] = [r0 + hs // 2 - 1, c0 + ws // 2 - 1]
            i += 1
    dims = np.asarray([H, W], np.float32)
    keypoints = (2 * kp_px / (dims - 1) - 1).astype(np.float32)
    return regions, keypoints


def plane_scene(H=48, W=64, depth=2.0, xi=(0.03, -0.02, 0.01, 0.08, 0.04, -0.03)):
    """Return (K, src_img, trg_img, T_true) for a fronto-parallel textured
    plane at the given depth; the target view is rendered exactly by inverse
    warping."""
    K = jnp.asarray(
        [[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1.0]], jnp.float32
    )
    src_img = jnp.asarray(smooth_texture(H, W))
    T_true = se3.exp(jnp.asarray(xi, jnp.float32))
    Kinv = jnp.linalg.inv(K)
    Tinv = se3.inverse(T_true)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    uvg = jnp.asarray(np.stack([u.ravel(), v.ravel()], -1))
    rays = jnp.concatenate([uvg, jnp.ones((H * W, 1))], -1) @ Kinv.T
    d = (depth - Tinv[2, 3]) / (rays @ Tinv[2, :3])
    X_s = projection.transform(rays * d[:, None], Tinv)
    trg_vals, _ = sample_at_pixels(src_img, projection.project(X_s, K))
    trg_img = trg_vals.reshape(H, W, src_img.shape[-1])
    return K, src_img, trg_img, T_true


def plane_keyframes(H=48, W=64, depth=2.0, rows=2, cols=2, base_logdepth=0.0,
                    capacity=None):
    """Source KeyFrame with segment geometry (frozen logdepth=base, i.e. depth
    correct up to a per-segment shift) + supporting target KeyFrame."""
    K, src_img, trg_img, T_true = plane_scene(H, W, depth)
    regions, keypoints = segment_grid(H, W, rows, cols)
    logdepth = np.full(regions.shape, base_logdepth, np.float32) * regions
    geo = make_segment_geometry(keypoints, regions, logdepth)
    src_kf = KeyFrame(image=src_img, K=K, K_img=K, geo=geo)
    trg_kf = KeyFrame(image=trg_img, K=K, K_img=K, geo=None)
    if capacity is None:
        capacity = max(8192, int(np.ceil(regions.sum() / 1024) * 1024))
    bundle = build_bundle_np(regions, logdepth, capacity=capacity)
    return src_kf, trg_kf, bundle, T_true, depth
