"""Segment-based depth completion (workload #2).

Reference: depth_completion/segment_based_completion.py — sparse depth
pixels become the frontend's segment query keypoints; each resulting segment
takes the median log-depth shift against the sparse depth
(``segment_based_depth_reinit``), per-segment depths are unprojected densely
and overlapping segments averaged; a fallback rerun with looser SAM settings
(nms off, select_smallest off) patches pixels still invalid when coverage
< 85% (:79-88).  No optimization loop — frontend + median alignment only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..odometry.depth_init import segment_based_depth_reinit


def render_depth_avg(depths: np.ndarray):
    """Average per-segment depth maps over overlapping valid pixels
    (segment_based_completion.py:21-27); returns (depth (H, W), invalid)."""
    if depths.shape[0] == 0:
        H, W = depths.shape[1:] if depths.ndim == 3 else (0, 0)
        return np.zeros((H, W), np.float32), np.ones((H, W), bool)
    invalid = depths.max(axis=0) < 1e-6
    d = np.where(depths < 1e-6, 0.0, depths)
    count = (d > 1e-6).sum(axis=0) + 1e-6
    return (d.sum(axis=0) / count).astype(np.float32), invalid


def infer_depth(frontend, image, keypoints_norm, K, sparse_depth, rerun=False):
    """One completion pass (segment_based_completion.py:30-56)."""
    kf = frontend.process_to_kf(
        image, K, keypoints=keypoints_norm, loose=rerun
    )
    regions = kf["regions"]
    logdepth = kf["logdepth_perseg"]
    kp_rc = kf["keypoints_rc"]

    kp_logdepth, visible = segment_based_depth_reinit(
        sparse_depth, regions, logdepth, kp_rc, mode="median", return_info=True
    )

    # dense per-segment depths: exp(frozen + shift), -1 outside regions
    shift = kp_logdepth - logdepth[np.arange(len(kp_rc)), kp_rc[:, 0], kp_rc[:, 1]]
    depths = np.exp(logdepth + shift[:, None, None]).astype(np.float32)
    depths[~regions] = -1.0
    depths = depths[visible]
    return render_depth_avg(depths)


class DepthCompletion:
    """Reference DepthCompletion class (segment_based_completion.py:59-92)."""

    def __init__(self, frontend, invalid_ratio_thresh: float = 0.15):
        self.frontend = frontend
        self.invalid_ratio_thresh = invalid_ratio_thresh

    def depth_completion(self, image, K, sparse_depth):
        sparse_depth = np.asarray(sparse_depth, np.float32)
        H, W = sparse_depth.shape
        r, c = np.nonzero(sparse_depth > 1e-6)
        dims = np.asarray([H, W], np.float32)
        keypoints_norm = (
            2.0 * np.stack([r, c], axis=1).astype(np.float32) / (dims - 1) - 1.0
        )

        depths, invalid = infer_depth(
            self.frontend, image, keypoints_norm, K, sparse_depth
        )
        invalid_ratio = invalid.sum() / invalid.size
        if invalid_ratio > self.invalid_ratio_thresh:
            depths_new, invalid_new = infer_depth(
                self.frontend, image, keypoints_norm, K, sparse_depth, rerun=True
            )
            depths = depths.copy()
            depths[invalid] = depths_new[invalid]
            invalid = np.logical_and(invalid, invalid_new)
        return depths, invalid
