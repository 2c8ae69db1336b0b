"""End-to-end CLI smoke: run_sfm.py --odom over an on-disk TUM-format
dataset (rendered plane sequence written as real PNG rgb/depth files +
associations.txt + groundtruth.txt), stub frontend, subprocess, CPU.

This drives the exact user entry path: YAML config -> load_dataset
('tum') -> native C++ loader -> GridSegmentFrontend -> Odometry -> TUM
trajectory export + built-in Sim(3) ATE + trajectory plot.
"""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from test_odometry import PlaneSequence

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum_plane")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    ds = PlaneSequence(n_frames=8, H=64, W=96)
    assoc, gt = [], ["# ground truth trajectory"]
    for i in range(len(ds)):
        fr = ds[i]
        ts = f"{float(i):.6f}"
        cv2.imwrite(str(root / "rgb" / f"{i}.png"), fr["image"][..., ::-1])
        cv2.imwrite(
            str(root / "depth" / f"{i}.png"),
            np.clip(fr["depth"] * 5000.0, 0, 65535).astype(np.uint16),
        )
        assoc.append(f"{ts} rgb/{i}.png {ts} depth/{i}.png")
        T = fr["T"]
        q = Rotation.from_matrix(T[:3, :3]).as_quat()  # xyzw
        t = T[:3, 3]
        gt.append(
            f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}"
        )
    (root / "associations.txt").write_text("\n".join(assoc))
    (root / "groundtruth.txt").write_text("\n".join(gt))
    return root, ds.K


@pytest.fixture()
def odom_config(tum_dir, tmp_path):
    root, K = tum_dir
    out = tmp_path / "results"
    cfg = f"""
save_path: {out}/
dataset:
  type: tum
  path: {root}/
  traj_file: {root}/groundtruth.txt
  intrinsics: [{K[0,0]}, {K[1,1]}, {K[0,2]}, {K[1,2]}]
frontend:
  downsample_pow: 0
alignment:
  opt_supporting: true
  mapping:
    supp_every_n: 2
    init_steps: 40
    steps: 30
    continual_steps: 4
    solver: gn
    gn_max_iters: 8
  mono_init: false
  affine_compensation: false
  pyramid_min: 0
  pyramid_max: 1
  track:
    lr: 0.005
    pyramid_min: 0
    pyramid_max: 2
    steps: [0, 40]
    solver: gn
    gn_max_iters: 10
  init_frames: 3
kf:
  depth_validity_ratio: 0.75
  translation_thresh: 0.045
window_size: 4
"""
    p = tmp_path / "odom_plane.yaml"
    p.write_text(cfg)
    return p, out


class TestCliOdometry:
    def test_run_sfm_odom_subprocess(self, odom_config):
        cfg_path, out_dir = odom_config
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "run_sfm.py"), "--cpu",
                "--config", str(cfg_path), "--odom", "--stub-frontend",
                "--stub-rows", "4", "--stub-cols", "5", "--max-frames", "8",
                "--live-viz", str(out_dir / "live"),
            ],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "ATE RMSE" in proc.stdout, proc.stdout[-2000:]
        rmse = float(proc.stdout.split("ATE RMSE (Sim3):")[1].split("m")[0])
        assert rmse < 0.05, proc.stdout[-2000:]
        for artifact in ("converted_tum_traj.txt", "converted_gt_tum_traj.txt",
                         "trajectory.png"):
            assert os.path.exists(os.path.join(out_dir, artifact)), artifact
        # exported trajectory is TUM-format: 8 columns, parseable
        traj = np.loadtxt(os.path.join(out_dir, "converted_tum_traj.txt"))
        assert traj.ndim == 2 and traj.shape[1] == 8
        # live viz snapshots were published during the solve
        import json

        live = json.loads(
            (out_dir / "live" / "live.json").read_text()
        )
        assert live["seq"] >= 7 and live["clouds"], live["seq"]
        assert (out_dir / "live" / "live.html").exists()
        # final interactive map with pickable segments (seg payload present)
        viewer = (out_dir / "viewer.html").read_text()
        assert '"seg":' in viewer and "pickables" in viewer

        # the standalone converter reproduces the export from the saved run
        conv = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "convert_traj_to_tum.py"),
                "--run", str(out_dir), "--config", str(cfg_path),
            ],
            cwd=REPO, capture_output=True, text=True, timeout=600,
        )
        assert conv.returncode == 0, conv.stderr[-2000:]
        traj2 = np.loadtxt(os.path.join(out_dir, "converted_tum_traj.txt"))
        np.testing.assert_allclose(traj2, traj, atol=1e-6)


@pytest.fixture()
def replica_dir(tum_dir, tmp_path):
    """Replica-format mirror of the plane sequence: rgb/rgb_i.png,
    depth/depth_i.png (/1000 scale), traj_w_c.txt of flattened 4x4 rows."""
    ds = PlaneSequence(n_frames=4, H=64, W=96)
    root = tmp_path / "replica_plane"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rows = []
    for i in range(len(ds)):
        fr = ds[i]
        cv2.imwrite(str(root / "rgb" / f"rgb_{i}.png"), fr["image"][..., ::-1])
        cv2.imwrite(
            str(root / "depth" / f"depth_{i}.png"),
            np.clip(fr["depth"] * 1000.0, 0, 65535).astype(np.uint16),
        )
        rows.append(" ".join(str(v) for v in fr["T"].reshape(-1)))
    (root / "traj_w_c.txt").write_text("\n".join(rows))
    return root, ds.K


class TestCliTwoFrame:
    @pytest.mark.parametrize("solver", ["adam", "gn"])
    def test_run_sfm_two_frame_subprocess(self, replica_dir, tmp_path, solver):
        root, K = replica_dir
        out = tmp_path / "results_tf"
        cfg = f"""
save_path: {out}/
dataset:
  type: replica
  path: {root}/
  source_id: 0
  target_id: 2
  intrinsics: [{K[0,0]}, {K[1,1]}, {K[0,2]}, {K[1,2]}]
frontend:
  downsample_pow: 0
alignment:
  pyramid_min: 0
  pyramid_max: 2
  mapping:
    solver: {solver}
    gn_max_iters: 25
"""
        cfg_path = tmp_path / "tf_plane.yaml"
        cfg_path.write_text(cfg)
        proc = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "run_sfm.py"), "--cpu",
                "--config", str(cfg_path), "--stub-frontend",
                "--stub-rows", "4", "--stub-cols", "5",
            ],
            cwd=REPO, capture_output=True, text=True, timeout=1200,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "two-frame SfM done" in proc.stdout, proc.stdout[-2000:]
        err = float(proc.stdout.split("pose err |log|")[1].split()[0])
        # GT+noise init (sigma 0.05) must not diverge; joint solve refines
        assert err < 0.12, proc.stdout[-1500:]
        assert os.path.exists(out / "src_pointcloud.ply")
        assert '"seg":' in (out / "viewer.html").read_text()
        res = np.load(out / "two_frame_result.npz")
        assert np.all(np.isfinite(res["pose"])) and res["pose"].shape == (4, 4)
