"""Integrated perception->estimation pipeline (VERDICT r1 #6a).

The REAL frontend pipeline (mask_generation.infer_masks -> BiNI crop/full
routing -> depth-discontinuity split -> put_keypoints_back) driven by
structured fakes (coherent Voronoi blob masks, analytic scene normals),
feeding the REAL odometry driver (GN tracking + windowed GN mapping) on an
analytically rendered piecewise-planar sequence.  This is the chain the
reference runs as frontend/process_frame.py:207-255 ->
odometery/odometery.py:1030-1054, executing as ONE coherent system.

examples/e2e_planes.py runs the same chain at TUM scale (240x320) on-chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from super_primitive_tpu.config import load_config
from super_primitive_tpu.data.synthetic import PlanesScene, PlanesSequence
from super_primitive_tpu.eval.trajectory import ate_rmse
from super_primitive_tpu.frontend.fakes import StructuredFakeFrontend
from super_primitive_tpu.lie import se3
from super_primitive_tpu.odometry.odometry import Odometry


def make_cfg(tmpdir, H, W):
    return load_config({
        "save_path": str(tmpdir),
        "window_size": 3,
        "frontend": {
            "downsample_pow": 0,
            "num_pts": 48, "num_pts_active": 16,
            "normals": {"integration_shape": [H // 2, W // 2],
                        "network_dim": [H, W]},
            "cg_max_iter": 150, "cg_tol": 1e-3,
            "check_for_depth_disc": True,
        },
        "sam_params": {"infer_resolution": [H, W]},
        "aligment": {
            "mono_init": True,
            "affine_compensation": False,
            "opt_supporting": True,
            "init_frames": 3,
            "mapping": {"supp_every_n": 3, "init_steps": 60,
                        "steps": 40, "continual_steps": 5,
                        "solver": "gn", "gn_max_iters": 15},
            "track": {"pyramid_min": 0, "pyramid_max": 2,
                      "steps": [0, 250], "solver": "gn", "gn_max_iters": 15},
        },
        "kf": {"depth_validity_ratio": 0.60, "translation_thresh": 0.10},
    })


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    H, W = 96, 128
    ds = PlanesSequence(n_frames=10, H=H, W=W)
    cfg = make_cfg(tmp_path_factory.mktemp("planes"), H, W)
    fe = StructuredFakeFrontend(cfg, seed=0, n_cells=24)
    odom = Odometry(cfg, fe, ds)
    traj = odom.run()
    return ds, odom, traj


class TestFrontendOutputs:
    def test_coherent_masks_and_depth(self):
        """The fake-driven REAL frontend produces dense coherent geometry:
        near-full coverage and per-segment depth matching GT up to the
        per-segment gauge (BiNI's scalar DoF)."""
        H, W = 96, 128
        ds = PlanesSequence(n_frames=1, H=H, W=W)
        cfg = make_cfg("/tmp/unused_pipeline", H, W)
        fe = StructuredFakeFrontend(cfg, seed=0, n_cells=24)
        f0 = ds[0]
        fe.observe(f0)
        kf = fe.process_to_kf(f0["image"], f0["intrinsics"])
        cov = kf["regions"].any(axis=0).mean()
        assert cov > 0.9, cov
        errs = []
        for i in range(kf["regions"].shape[0]):
            m = kf["regions"][i]
            if m.sum() < 30:
                continue
            diff = kf["logdepth_perseg"][i][m] - np.log(
                np.maximum(f0["depth"][m], 1e-6)
            )
            errs.append(np.abs(diff - np.median(diff)).mean())
        # median segment reconstructs its depth SHAPE to ~1%; segments
        # straddling the occluder boundary are the tail (split + bilateral
        # weights bound, not eliminate, their error)
        assert np.median(errs) < 0.03, np.median(errs)

    def test_occluder_produces_disconnected_split(self):
        """Voronoi cells straddling the floating panel get split by the
        depth-discontinuity CC pass: more output segments than SAM masks."""
        H, W = 96, 128
        ds = PlanesSequence(n_frames=1, H=H, W=W)
        cfg = make_cfg("/tmp/unused_pipeline2", H, W)
        fe = StructuredFakeFrontend(cfg, seed=0, n_cells=24)
        f0 = ds[0]
        fe.observe(f0)
        kf = fe.process_to_kf(f0["image"], f0["intrinsics"])
        # depth jump at the panel boundary is ~1.2 units at z~2 — a split
        # must fire somewhere along it
        assert kf["regions"].shape[0] > 20


class TestIntegratedOdometry:
    def test_runs_and_keyframes(self, pipeline_result):
        ds, odom, traj = pipeline_result
        assert len(traj) >= 2
        assert len(odom.global_track_trajectory) == len(ds) - 1

    def test_sim3_ate(self, pipeline_result):
        """Monocular scale is free (mono_init): judge by Sim(3) ATE."""
        ds, odom, traj = pipeline_result
        est = {ts: np.asarray(T) for ts, T in odom.global_track_trajectory.items()}
        gt = {ts: np.asarray(ds.poses[int(float(ts))], np.float32) for ts in est}
        ate = ate_rmse(gt, est)["rmse"]
        # scene diameter ~3; a coherent pipeline tracks to a few percent
        assert ate < 0.10, ate
