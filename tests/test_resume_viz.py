"""Checkpoint/resume round-trip + viz export tests."""

import os

import numpy as np
import pytest

from super_primitive_tpu.config import load_config
from super_primitive_tpu.frontend.stub import GridSegmentFrontend
from super_primitive_tpu.odometry.odometry import Odometry
from super_primitive_tpu.viz.export import (
    keyframe_pointcloud,
    save_ply,
    save_residual_png,
    save_trajectory_plot,
)

from test_odometry import PlaneSequence, pose_err


def make_cfg(tmp, extra=None):
    base = {
        "save_path": tmp,
        "save_every": 4,
        "window_size": 3,
        "aligment": {
            "mono_init": False, "affine_compensation": False,
            "opt_supporting": True, "init_frames": 3,
            "mapping": {"supp_every_n": 3, "init_steps": 40,
                        "steps": 30, "continual_steps": 4},
            "track": {"lr": 5e-3, "pyramid_min": 0, "pyramid_max": 2,
                      "steps": [0, 200]},
        },
        "kf": {"depth_validity_ratio": 0.60, "translation_thresh": 0.10},
    }
    if extra:
        base.update(extra)
    return load_config(base)


class TestResume:
    def test_save_and_restore(self, tmp_path):
        ds = PlaneSequence(n_frames=14)
        cfg = make_cfg(str(tmp_path))
        odom = Odometry(cfg, GridSegmentFrontend(rows=4, cols=5), ds)
        odom.run(max_frames=9)

        # checkpoints exist
        ckpts = os.listdir(str(tmp_path) + "/curr_kfs")
        assert len(ckpts) >= 1
        tag = sorted(ckpts)[-1]

        # resume from the checkpoint and continue
        cfg2 = make_cfg(str(tmp_path) + "_resume", {
            "restore": {"path": str(tmp_path), "frame_id": int(tag)},
        })
        # more track iterations to absorb the multi-frame cold-start gap
        import dataclasses
        cfg2 = dataclasses.replace(
            cfg2, alignment=dataclasses.replace(
                cfg2.alignment, track=dataclasses.replace(
                    cfg2.alignment.track, steps=(0, 400))))
        odom2 = Odometry(cfg2, GridSegmentFrontend(rows=4, cols=5), ds)
        traj2 = odom2.run()
        assert odom2.num_kfs >= 1
        # restored window matches what was saved
        assert odom2.host_kfs[0].timestamp in [k.zfill(6) for k in
                                               odom.global_kf_trajectory]
        # continued tracking recovers after the cold start (the first resumed
        # frame must bridge several frames of motion at once)
        post = sorted(
            (int(ts), pose_err(T, ds.poses[int(ts)]))
            for ts, T in odom2.global_track_trajectory.items()
            if int(ts) > int(tag)
        )
        assert len(post) >= 3
        # resume continuity: errors bounded and not exploding (the absolute
        # level depends on the iteration budget vs per-frame motion)
        assert post[-1][1] < 0.12, post
        assert max(e for _, e in post) < 0.2, post


class TestVizExport:
    def test_ply(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(100, 3))
        colors = np.random.default_rng(1).uniform(0, 1, (100, 3))
        fp = save_ply(str(tmp_path / "cloud.ply"), pts, colors)
        lines = open(fp).read().splitlines()
        assert lines[0] == "ply"
        assert "element vertex 100" in lines[2]
        assert len(lines) == 10 + 100  # header + points

    def test_pointcloud_lift(self):
        K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
        uv = np.asarray([[32.0, 24.0], [10.0, 5.0]])
        z = np.asarray([2.0, 1.0])
        pts, _ = keyframe_pointcloud(uv, z, K, np.eye(4))
        np.testing.assert_allclose(pts[0], [0, 0, 2.0], atol=1e-6)

    def test_residual_png(self, tmp_path):
        img = np.random.default_rng(0).uniform(0, 0.3, (32, 48, 3))
        fp = save_residual_png(str(tmp_path / "res.png"), img)
        assert os.path.getsize(fp) > 0

    def test_trajectory_plot(self, tmp_path):
        traj = {str(i): np.eye(4) + 0.01 * i for i in range(5)}
        fp = save_trajectory_plot(str(tmp_path / "traj.png"), {"est": traj})
        assert os.path.getsize(fp) > 0
