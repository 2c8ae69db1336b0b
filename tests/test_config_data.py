"""Config schema + dataset loader tests (with generated fixtures)."""

import os

import cv2
import numpy as np
import pytest

from super_primitive_tpu.config import load_config
from super_primitive_tpu.data import load_dataset
from super_primitive_tpu.data.tum import TUMUndistortDataset


REFERENCE_CONFIGS = [
    "/root/reference/config/replica_sfm_example.yaml",
    "/root/reference/config/tum/odom_desk.yaml",
    "/root/reference/config/tum/odom_360.yaml",  # contains dead loop_closure key
    "/root/reference/config/depth_completion/void_dataset.yaml",
]


class TestConfig:
    @pytest.mark.parametrize("path", [p for p in REFERENCE_CONFIGS if os.path.exists(p)])
    def test_loads_reference_yaml(self, path):
        cfg = load_config(path)
        assert cfg.frontend.num_pts in (100, 300)
        assert cfg.sam_params.stability_threshold == 0.90

    def test_odom_desk_values(self):
        path = "/root/reference/config/tum/odom_desk.yaml"
        if not os.path.exists(path):
            pytest.skip("reference configs unavailable")
        cfg = load_config(path)
        assert cfg.alignment.track.steps == (0, 0, 300)
        assert cfg.alignment.mapping.init_steps == 1000
        assert cfg.alignment.affine_compensation is True
        assert cfg.window_size == 5
        assert cfg.kf.translation_thresh == 0.2
        assert cfg.dataset.type == "tum_undistort"

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            load_config({"frontend": {"num_ptz": 5}})

    def test_aligment_typo_compat(self):
        cfg = load_config({"aligment": {"pyramid_max": 3}})
        assert cfg.alignment.pyramid_max == 3

    def test_defaults(self):
        cfg = load_config({})
        assert cfg.window_size == 5
        assert cfg.frontend.cg_max_iter == 1000


def _write_tum_fixture(root):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    r = np.random.default_rng(0)
    assoc = []
    for i in range(3):
        ts = 1000.0 + i * 0.03
        rgb = r.integers(0, 255, (480, 640, 3), np.uint8)
        depth = (r.uniform(0.5, 3.0, (480, 640)) * 5000).astype(np.uint16)
        cv2.imwrite(os.path.join(root, f"rgb/{i}.png"), rgb)
        cv2.imwrite(os.path.join(root, f"depth/{i}.png"), depth)
        assoc.append(f"{ts} rgb/{i}.png {ts} depth/{i}.png")
    with open(os.path.join(root, "associations.txt"), "w") as f:
        f.write("\n".join(assoc) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ground truth\n")
        for i in range(3):
            ts = 1000.0 + i * 0.03
            f.write(f"{ts} {0.1*i} 0.0 0.0 0.0 0.0 0.0 1.0\n")
    return root


class TestTUM:
    def test_load_and_pose(self, tmp_path):
        root = _write_tum_fixture(str(tmp_path) + "/")
        cfg = {
            "dataset": {
                "type": "tum",
                "path": root,
                "traj_file": os.path.join(root, "groundtruth.txt"),
            }
        }
        ds = load_dataset(cfg)
        assert len(ds) == 3
        s = ds[1]
        assert s["image"].shape == (480, 640, 3)
        assert s["depth"].dtype == np.float32
        assert s["depth"].max() <= 10.0
        np.testing.assert_allclose(s["T"][:3, 3], [0.1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(s["T"][:3, :3], np.eye(3), atol=1e-9)

    def test_undistort_crop(self, tmp_path):
        root = _write_tum_fixture(str(tmp_path) + "/")
        ds = TUMUndistortDataset(root, traj_file=os.path.join(root, "groundtruth.txt"))
        s = ds[0]
        assert s["image"].shape == (480 - 32, 640 - 64, 3)
        assert s["depth"].shape == (480 - 32, 640 - 64)
        np.testing.assert_allclose(s["intrinsics"][0, 2], 318.6 - 32)
        np.testing.assert_allclose(s["intrinsics"][1, 2], 255.3 - 16)


class TestReplica:
    def test_load(self, tmp_path):
        root = str(tmp_path)
        os.makedirs(os.path.join(root, "rgb"))
        os.makedirs(os.path.join(root, "depth"))
        r = np.random.default_rng(1)
        poses = np.tile(np.eye(4).reshape(1, 16), (2, 1))
        np.savetxt(os.path.join(root, "traj_w_c.txt"), poses, delimiter=" ")
        for i in range(2):
            cv2.imwrite(
                os.path.join(root, f"rgb/rgb_{i}.png"),
                r.integers(0, 255, (48, 64, 3), np.uint8),
            )
            cv2.imwrite(
                os.path.join(root, f"depth/depth_{i}.png"),
                (r.uniform(0.5, 3.0, (48, 64)) * 1000).astype(np.uint16),
            )
        ds = load_dataset({"dataset": {"type": "replica", "path": root}})
        assert len(ds) == 2
        s = ds[0]
        assert s["image"].shape == (48, 64, 3)
        assert abs(s["intrinsics"][0, 0] - 886.81) < 1e-6
