"""Replica dataset loader (reference: data/replica.py)."""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

DEPTH_SCALE = 1.0 / 1000.0
MAX_DEPTH = 10.0


def replica_K() -> np.ndarray:
    """1024x768 Replica render intrinsics (data/replica.py:14-27)."""
    return np.array(
        [[886.81, 0, 512.0], [0, 886.81, 384.0], [0, 0, 1.0]], np.float64
    )


class ReplicaDataset:
    def __init__(
        self, root_dir: str, normal_dir: Optional[str] = None, intrinsics=None
    ):
        self.root_dir = root_dir
        self.normal_dir = normal_dir
        if intrinsics is not None:
            fx, fy, cx, cy = intrinsics
            self._K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        else:
            self._K = replica_K()
        traj_file = os.path.join(root_dir, "traj_w_c.txt")
        self.Twc = np.loadtxt(traj_file, delimiter=" ").reshape([-1, 4, 4])

    def __len__(self):
        return self.Twc.shape[0]

    def __getitem__(self, idx):
        from .transforms import scale_and_filter_depth

        img_path = os.path.join(self.root_dir, f"rgb/rgb_{idx}.png")
        depth_path = os.path.join(self.root_dir, f"depth/depth_{idx}.png")
        image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        depth = cv2.imread(depth_path, -1).astype(np.float32)

        normals, normals_mask = None, None
        if self.normal_dir is not None:
            normals, normals_mask = load_gt_normals(
                os.path.join(self.normal_dir, f"depth_{idx}_tblr_k3.png")
            )
        return {
            "image": image,
            "depth": scale_and_filter_depth(depth, DEPTH_SCALE, MAX_DEPTH),
            "T": self.Twc[idx],
            "normals": normals,
            "normals_mask": normals_mask,
            "intrinsics": self._K,
            "timestamp": float(idx),
        }


def load_gt_normals(normal_path: str):
    """GT normal maps rendered for Replica (reference
    frontend/normals/normals_inferer.py:83-91): RGB png -> [-1, 1] normals,
    mask where any channel nonzero."""
    normal = cv2.cvtColor(cv2.imread(normal_path, cv2.IMREAD_ANYCOLOR), cv2.COLOR_BGR2RGB)
    mask = np.sum(normal, axis=2, keepdims=True) > 0
    normal = (normal.astype(np.float32) / 255.0) * 2.0 - 1.0
    return normal, mask
