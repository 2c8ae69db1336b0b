"""TUM RGB-D dataset loaders (reference: data/tum.py, data/tum_undistort.py).

Pure numpy/cv2 — frames come out as dicts with channels-last float-ready
arrays; poses are world-from-camera 4x4 from the nearest-timestamp
groundtruth line.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np
from scipy.spatial.transform import Rotation

DEPTH_SCALE = 1.0 / 5000.0
MAX_DEPTH = 10.0

# default (fr2+) intrinsics, data/tum.py:64-73
K_DEFAULT = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]], np.float64)

# fr1 intrinsics + distortion, data/tum_undistort.py:63-79
K_FR1 = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float64)
DIST_FR1 = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633])
CROP_W, CROP_H = 32, 16


def _png_size(path: str) -> Optional[tuple[int, int]]:
    """(height, width) from a PNG IHDR header without decoding the image."""
    try:
        with open(path, "rb") as f:
            head = f.read(26)
        if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
            return None
        w = int.from_bytes(head[16:20], "big")
        h = int.from_bytes(head[20:24], "big")
        return (h, w) if h > 0 and w > 0 else None
    except OSError:
        return None


def _load_groundtruth(traj_file: str) -> np.ndarray:
    with open(traj_file) as f:
        lines = [line for line in f if not line.startswith("#")]
    return np.loadtxt(lines, delimiter=" ")


def _pose_at_timestamp(t_poses: np.ndarray, timestamp: float) -> np.ndarray:
    """Nearest-timestamp GT pose as 4x4 (data/tum.py:98-106).  TUM lines are
    (t, tx, ty, tz, qx, qy, qz, qw)."""
    idx = int(np.abs(timestamp - t_poses[:, 0]).argmin())
    trans = t_poses[idx, 1:4]
    quat_xyzw = t_poses[idx, 4:8]
    T = np.eye(4)
    T[:3, :3] = Rotation.from_quat(quat_xyzw).as_matrix()
    T[:3, 3] = trans
    return T


class TUMDataset:
    """Plain TUM loader: associations.txt pairing, depth/5000, far clip 10m."""

    def __init__(
        self,
        root_dir: str,
        traj_file: Optional[str] = None,
        intrinsics=None,
        native: bool = True,
    ):
        self.root_dir = root_dir
        self.t_poses = _load_groundtruth(traj_file) if traj_file else None
        if intrinsics is not None:
            fx, fy, cx, cy = intrinsics
            self.intrinsics = np.array(
                [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64
            )
        else:
            self.intrinsics = K_DEFAULT.copy()

        with open(os.path.join(root_dir, "associations.txt")) as f:
            rows = [line.rstrip().split() for line in f]
        self.timestamps = np.array([float(r[0]) for r in rows])
        self.rgb_files = [r[1] for r in rows]
        self.depth_files = [r[3] for r in rows]

        self._rgb_loader = None
        self._depth_loader = None
        if native:
            try:
                from .native_loader import NativeImageLoader, get_lib

                if get_lib():
                    self._rgb_loader = NativeImageLoader(
                        [os.path.join(root_dir, f) for f in self.rgb_files]
                    )
                    self._depth_loader = NativeImageLoader(
                        [os.path.join(root_dir, f) for f in self.depth_files]
                    )
            except Exception as e:
                print(f"[tum] native loader unavailable: {e}")

    def __len__(self):
        return len(self.rgb_files)

    def _read_pair(self, idx):
        """Returns (image BGR uint8, depth raw) — the native path prefetches
        and decodes on C++ threads; note the native loader returns RGB, so we
        flip to keep this function's BGR contract for the cv2 path parity."""
        if self._rgb_loader is not None:
            image = self._rgb_loader[idx][..., ::-1]  # RGB -> BGR
            depth = self._depth_loader[idx]
            return image, depth
        depth = cv2.imread(os.path.join(self.root_dir, self.depth_files[idx]), -1)
        image = cv2.imread(os.path.join(self.root_dir, self.rgb_files[idx]))
        return image, depth

    def __getitem__(self, idx):
        from .transforms import bgr_to_rgb, scale_and_filter_depth

        image, depth = self._read_pair(idx)
        T = (
            _pose_at_timestamp(self.t_poses, self.timestamps[idx])
            if self.t_poses is not None
            else None
        )
        return {
            "image": bgr_to_rgb(image),
            "depth": scale_and_filter_depth(depth, DEPTH_SCALE, MAX_DEPTH),
            "T": T,
            "intrinsics": self.intrinsics,
            "timestamp": self.timestamps[idx],
        }


class TUMUndistortDataset(TUMDataset):
    """fr1 variant: cv2.undistort with fr1 coefficients + 32/16-px crop with
    principal point shifted accordingly (data/tum_undistort.py:64-130)."""

    def __init__(self, root_dir: str, traj_file: Optional[str] = None):
        super().__init__(root_dir, traj_file)
        self.intrinsics_full = K_FR1.copy()
        self.intrinsics = K_FR1.copy()
        self.intrinsics[0, 2] -= CROP_W
        self.intrinsics[1, 2] -= CROP_H
        # native path: undistort on the C++ decode threads (prefetch hides
        # the remap; the reference pays cv2.undistort on the critical loop)
        self._native_undistort = False
        if self._rgb_loader is not None and len(self) > 0:
            try:
                from .native_loader import undistort_maps

                # image size from the PNG header — a full probe decode
                # through the prefetching loader would trigger (and then
                # evict) several decodes with no undistort maps attached
                hw = _png_size(
                    os.path.join(self.root_dir, self.rgb_files[0])
                )
                if hw is None:
                    hw = self._rgb_loader[0].shape[:2]
                maps = undistort_maps(self.intrinsics_full, DIST_FR1, *hw)
                if maps is not None:
                    self._native_undistort = self._rgb_loader.set_undistort(*maps)
            except Exception as e:
                print(f"[tum_undistort] native undistort unavailable: {e}")

    def __getitem__(self, idx):
        from .transforms import bgr_to_rgb, scale_and_filter_depth

        image, depth = self._read_pair(idx)
        if not self._native_undistort:
            image = cv2.undistort(image, self.intrinsics_full, DIST_FR1)
        image = image[CROP_H:-CROP_H, CROP_W:-CROP_W, :]
        depth = depth[CROP_H:-CROP_H, CROP_W:-CROP_W]
        T = (
            _pose_at_timestamp(self.t_poses, self.timestamps[idx])
            if self.t_poses is not None
            else None
        )
        return {
            "image": bgr_to_rgb(image),
            "depth": scale_and_filter_depth(depth, DEPTH_SCALE, MAX_DEPTH),
            "T": T,
            "intrinsics": self.intrinsics,
            "timestamp": self.timestamps[idx],
        }
