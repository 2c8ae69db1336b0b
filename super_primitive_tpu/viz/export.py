"""Headless visualization/export layer.

Replaces the reference's Open3D GUI (gui/, tool/viz.py, tool/o3d_*.py) with
artifact export: the parity target is the *data* the GUI displays (SURVEY
§2.3#4) — per-keyframe point clouds, residual images, trajectory plots.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """ASCII PLY point cloud; colors float [0,1] or uint8."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(points)
    has_color = colors is not None
    if has_color:
        colors = np.asarray(colors).reshape(-1, 3)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            line = f"{points[i, 0]} {points[i, 1]} {points[i, 2]}"
            if has_color:
                line += f" {colors[i, 0]} {colors[i, 1]} {colors[i, 2]}"
            f.write(line + "\n")
    return path


def keyframe_pointcloud(
    bundle_uv: np.ndarray,
    depth: np.ndarray,
    K: np.ndarray,
    pose: np.ndarray,
    colors: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
):
    """Lift bundle pixels to a world-frame point cloud (the GUI's per-KF pcd,
    gui/sfm_gui.py:430-472)."""
    K = np.asarray(K)
    uv = np.asarray(bundle_uv)
    z = np.asarray(depth)
    x = (uv[:, 0] - K[0, 2]) * z / K[0, 0]
    y = (uv[:, 1] - K[1, 2]) * z / K[1, 1]
    pts = np.stack([x, y, z], axis=1)
    T = np.asarray(pose)
    pts_w = pts @ T[:3, :3].T + T[:3, 3]
    if valid is not None:
        pts_w = pts_w[valid]
        colors = colors[valid] if colors is not None else None
    return pts_w, colors


def save_residual_png(path: str, residual_img: np.ndarray, scale: float = 4.0):
    """Save |residual| as a heatmap PNG (the GUI's residual scatter)."""
    import cv2

    r = np.clip(np.abs(np.asarray(residual_img)) * scale, 0, 1)
    if r.ndim == 3:
        r = r.mean(axis=-1)
    img = (r * 255).astype(np.uint8)
    heat = cv2.applyColorMap(img, cv2.COLORMAP_INFERNO)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, heat)
    return path


def save_trajectory_plot(path: str, trajectories: dict, title: str = "trajectory"):
    """Top-down (x, z) plot of named trajectories {label: {ts: pose}}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    for label, traj in trajectories.items():
        keys = sorted(traj.keys(), key=lambda s: int(s))
        t = np.stack([np.asarray(traj[k])[:3, 3] for k in keys])
        ax.plot(t[:, 0], t[:, 2], label=label, linewidth=1.2)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.legend()
    ax.axis("equal")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
