"""Keyframe gating criteria (reference: odometery/kf_criteria.py).

``translation_difference`` normalizes the translation gap by the median
rendered depth (:7-18).  ``rotation_difference`` exists for parity but — as
in the reference — is never used for gating (rotation_thresh is read but
untested, odometery.py:996-1016)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of ``values`` where ``mask`` (matches torch.median's
    lower-middle element for even counts)."""
    n = jnp.sum(mask)
    big = jnp.finfo(values.dtype).max
    sorted_vals = jnp.sort(jnp.where(mask, values, big))
    idx = jnp.clip((n - 1) // 2, 0, values.shape[0] - 1)
    return sorted_vals[idx]


def translation_difference(pose_src: jax.Array, pose_target: jax.Array, depth: jax.Array):
    """Translation gap scaled by median valid rendered depth
    (kf_criteria.py:7-18).  ``depth`` is the scatter-rendered (H, W) map."""
    flat = depth.reshape(-1)
    scale = masked_median(flat, flat > 1e-6)
    diff = jnp.linalg.norm(pose_src[:3, 3] - pose_target[:3, 3])
    return diff / (scale + 1e-6), scale


def rotation_difference(pose_src: np.ndarray, pose_target: np.ndarray) -> float:
    """Relative rotation angle in degrees (kf_criteria.py:20-28)."""
    delta = np.linalg.inv(np.asarray(pose_src)) @ np.asarray(pose_target)
    rot_vec = Rotation.from_matrix(delta[:3, :3]).as_rotvec()
    return float(np.linalg.norm(rot_vec) * 180.0 / np.pi)
