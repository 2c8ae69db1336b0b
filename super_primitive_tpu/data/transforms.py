"""Image/depth transforms shared by the dataset loaders (reference:
data/image_transforms.py, data/tum.py:8-36)."""

from __future__ import annotations

import numpy as np


def bgr_to_rgb(image: np.ndarray) -> np.ndarray:
    return image[..., ::-1].copy()


def scale_and_filter_depth(depth: np.ndarray, scale: float, max_depth: float) -> np.ndarray:
    """Depth to meters + far clip to 0 (reference semantics: DepthScale then
    DepthFilter, data/tum.py:16-36)."""
    depth = depth.astype(np.float32) * scale
    depth[depth > max_depth] = 0.0
    return depth


def image_to_float(image_hwc_uint8: np.ndarray) -> np.ndarray:
    """HWC uint8 [0,255] -> HWC float32 [0,1] (tool/etc.py:6-40 image_tt,
    kept channels-last for the TPU layout)."""
    return image_hwc_uint8.astype(np.float32) / 255.0
