"""Shared config + driver for the synthetic end-to-end odometry runs.

One source of truth for the TUM-scale synthetic workload shapes
(480x640 frames, 240x320 keyframe geometry, window 4, 128+32 SAM prompts)
so examples/e2e_planes.py, bench.py's ``e2e_steady_state`` leg, and ad-hoc
probes all hit the SAME jit signatures — every divergent shape is a fresh
30-60 s relay compile (NOTES_NEXT infrastructure notes).

Reference workload being mirrored: README.md:61-78 (TUM fr1 odometry) with
frontend/process_frame.py:207-255 perception and odometery/odometery.py's
track/map loop.
"""

from __future__ import annotations

import time

import numpy as np


def make_e2e_config(solver: str, small: bool = False, gn_iters: int = 30,
                    point_stride: int = 1, save_path: str | None = None):
    """The e2e synthetic odometry Config (exact shapes of examples/e2e_planes)."""
    from ..config import load_config

    H, W, pow_ = (96, 128, 0) if small else (480, 640, 1)
    extra = {} if solver == "adam" else {"solver": "gn", "gn_max_iters": gn_iters}
    map_extra = dict(extra)
    if solver != "adam":
        map_extra["gn_point_stride"] = point_stride
    return load_config({
        "save_path": save_path or f"/tmp/sp_e2e_planes_{solver}",
        "window_size": 4,
        "frontend": {
            "downsample_pow": pow_,
            "num_pts": 128, "num_pts_active": 32,
            "normals": {"integration_shape": [240, 320] if not small else [48, 64],
                        "network_dim": [H, W]},
            "cg_max_iter": 300, "cg_tol": 1e-3,
            "check_for_depth_disc": True,
        },
        "sam_params": {"infer_resolution": [240, 320] if not small else [96, 128]},
        "aligment": {
            "mono_init": True,
            "affine_compensation": False,
            "opt_supporting": True,
            "init_frames": 3,
            "mapping": {"supp_every_n": 3, "init_steps": 60,
                        "steps": 40, "continual_steps": 5, **map_extra},
            "track": {"pyramid_min": 0, "pyramid_max": 3,
                      "steps": [0, 0, 300], **extra},
        },
        "kf": {"depth_validity_ratio": 0.60, "translation_thresh": 0.08},
    })


def run_e2e(solver: str, frames: int = 20, small: bool = False,
            n_cells: int | None = None, gn_iters: int = 30,
            point_stride: int = 1, path: str = "auto",
            device_sam: bool = True, seed: int = 0) -> dict:
    """Run the synthetic sequence end-to-end; returns a stats dict.

    Keys: ate (Sim(3) ATE dict over all tracked frames), wall_s, frames,
    keyframes, kf_add_log, timer (StageTimer), odom (the driver, for
    callers needing more).
    """
    from ..data.synthetic import PlanesSequence
    from ..eval.trajectory import ate_rmse
    from ..frontend.fakes import StructuredFakeFrontend
    from ..odometry.odometry import Odometry

    H, W = (96, 128) if small else (480, 640)
    if n_cells is None:
        n_cells = 24 if small else 64
    if path == "auto":
        path = "orbit" if frames > 40 else "linear"
    cfg = make_e2e_config(solver, small=small, gn_iters=gn_iters,
                          point_stride=point_stride)
    ds = PlanesSequence(n_frames=frames, H=H, W=W, path=path)
    fe = StructuredFakeFrontend(cfg, seed=seed, n_cells=n_cells,
                                device_sam=device_sam)
    odom = Odometry(cfg, fe, ds)
    t0 = time.perf_counter()
    traj = odom.run()
    wall = time.perf_counter() - t0

    est = {ts: np.asarray(T) for ts, T in odom.global_track_trajectory.items()}
    gt = {ts: np.asarray(ds.poses[int(float(ts))], np.float32) for ts in est}
    return {
        "ate": ate_rmse(gt, est),
        "wall_s": wall,
        "frames": len(ds),
        "keyframes": len(traj),
        "kf_add_log": odom.kf_add_log,
        "timer": odom.timer,
        "odom": odom,
    }
