"""Keyframe persistence, checkpoint/resume and trajectory export.

Reference: odometery/utils.py:5-26 (per-KF pickle dicts),
odometery.py:1090-1221 (save_state/load_state/save_traj, run-dir layout),
convert_traj_to_tum.py (TUM-format export for evo).

Portable serialization: npz per keyframe + json trajectories (instead of
torch pickles), same directory layout:
  <save_path>/curr_kfs/<ts>/kf_*.npz
  <save_path>/traj/kf_traj_<tag>.json, track_traj_<tag>.json
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .window import HostKeyFrame


def dump_kf(path: str, kf: HostKeyFrame) -> None:
    os.makedirs(path, exist_ok=True)
    np.savez_compressed(
        os.path.join(path, f"kf_{kf.timestamp}.npz"),
        timestamp=kf.timestamp,
        image=kf.image,
        K=kf.K,
        regions=kf.regions,
        logdepth_perseg=kf.logdepth_perseg,
        keypoints_rc=kf.keypoints_rc,
        pose=kf.pose,
        kp_logdepth=kf.kp_logdepth,
        affine=kf.affine,
    )


def load_kf(path: str, timestamp: str) -> HostKeyFrame:
    d = np.load(os.path.join(path, f"kf_{timestamp}.npz"))
    return HostKeyFrame(
        timestamp=str(d["timestamp"]),
        image=d["image"],
        K=d["K"],
        regions=d["regions"],
        logdepth_perseg=d["logdepth_perseg"],
        keypoints_rc=d["keypoints_rc"],
        pose=d["pose"],
        kp_logdepth=d["kp_logdepth"],
        affine=d["affine"],
    )


def save_trajectory(path: str, traj: dict, tag: str, name: str = "kf_traj") -> str:
    """``traj`` maps timestamp-string -> 4x4 pose array."""
    os.makedirs(path, exist_ok=True)
    out = {ts: np.asarray(T).tolist() for ts, T in traj.items()}
    fp = os.path.join(path, f"{name}_{tag}.json")
    with open(fp, "w") as f:
        json.dump(out, f)
    return fp


def load_trajectory(fp: str) -> dict:
    with open(fp) as f:
        raw = json.load(f)
    return {ts: np.asarray(T) for ts, T in raw.items()}


def export_tum_trajectory(
    traj: dict,
    timestamps: dict,
    out_path: str,
) -> str:
    """Write a TUM-format trajectory file for evo_ape
    (convert_traj_to_tum.py:13-29): lines ``t tx ty tz qx qy qz qw``.

    ``traj``: frame-id-string -> 4x4 world pose;
    ``timestamps``: frame-id-string -> float dataset timestamp.
    """
    from scipy.spatial.transform import Rotation

    lines = []
    for fid in sorted(traj.keys(), key=lambda s: int(s)):
        T = np.asarray(traj[fid])
        t = T[:3, 3]
        q = Rotation.from_matrix(T[:3, :3]).as_quat()  # xyzw
        ts = timestamps[fid]
        lines.append(
            f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}"
        )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path
