"""Segment-based depth (re-)initialization.

Reference: odometery/depth_init.py:10-67 — for each segment, the per-keypoint
log-depth scalar is set from the mean/median *shift* between an estimated
depth map (rendered from the previous keyframe, or GT/sparse depth) and the
segment's frozen log-depth, plus the frozen log-depth at the keypoint pixel;
segments with no valid estimate get the median over visible segments.

Host-side numpy: runs once per keyframe, inputs are the host geometry maps.
"""

from __future__ import annotations

import numpy as np


def _lower_median(x: np.ndarray) -> float:
    """torch.median semantics: lower-middle element for even counts."""
    s = np.sort(x.reshape(-1))
    return float(s[(s.size - 1) // 2])


def segment_based_depth_reinit(
    estimated_depth: np.ndarray,
    regions: np.ndarray,
    logdepth_perseg: np.ndarray,
    keypoints_rc: np.ndarray,
    mode: str = "median",
    return_info: bool = False,
):
    """Per-segment keypoint log-depths from an estimated (H, W) depth map.

    ``regions`` (N, H, W) bool, ``logdepth_perseg`` (N, H, W),
    ``keypoints_rc`` (N, 2) integer pixel (row, col).
    """
    assert mode in ("mean", "median")
    eps = 1e-6
    est = np.asarray(estimated_depth, np.float32).copy()
    valid_est = est >= eps
    est[~valid_est] = eps
    est_log = np.log(est)

    N = regions.shape[0]
    shifts = est_log[None] - logdepth_perseg            # (N, H, W)
    valid_regions = regions & valid_est[None]
    num_valid = valid_regions.reshape(N, -1).sum(axis=1)
    visible = num_valid > 0

    kp_base = logdepth_perseg[np.arange(N), keypoints_rc[:, 0], keypoints_rc[:, 1]]

    out = np.zeros(N, np.float32)
    if mode == "mean":
        sums = (shifts * valid_regions).reshape(N, -1).sum(axis=1)
        out[visible] = sums[visible] / num_valid[visible] + kp_base[visible]
    else:
        for i in np.nonzero(visible)[0]:
            out[i] = _lower_median(shifts[i][valid_regions[i]]) + kp_base[i]
    if visible.any():
        out[~visible] = _lower_median(out[visible])
    if return_info:
        return out, visible
    return out
