#!/usr/bin/env python
"""Self-contained demo: every workload on a synthetic rendered scene.

No datasets or checkpoints needed — renders a textured-plane sequence,
writes it as a TUM-format dataset, then runs:

  1. two-frame SfM (joint pose + per-segment depth),
  2. monocular odometry with windowed mapping + built-in Sim(3) ATE,
  3. segment-based depth completion from sparse points,

exporting PLY point clouds, trajectory plots and TUM-format trajectories to
``--out``.

    python examples/demo_synthetic.py --out /tmp/sp_demo [--gn]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sp_demo")
    ap.add_argument("--frames", type=int, default=18)
    ap.add_argument("--gn", action="store_true", help="use the GN/LM solvers")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    import jax.numpy as jnp

    from test_odometry import PlaneSequence, pose_err

    from super_primitive_tpu.config import load_config
    from super_primitive_tpu.eval.trajectory import ate_rmse
    from super_primitive_tpu.frontend.stub import GridSegmentFrontend
    from super_primitive_tpu.keyframe import keyframe_pyramid, KeyFrame, build_bundle_np, make_segment_geometry
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.odometry.odometry import Odometry
    from super_primitive_tpu.solve.two_frame import TwoFrameConfig, solve_two_frame
    from super_primitive_tpu.viz.export import (
        keyframe_pointcloud, save_ply, save_trajectory_plot,
    )

    os.makedirs(args.out, exist_ok=True)
    print(f"[demo] backend: {jax.default_backend()}")
    ds = PlaneSequence(n_frames=args.frames, H=64, W=96)
    fe = GridSegmentFrontend(rows=4, cols=5)

    # ---------------------------------------------------- 1. two-frame SfM
    print("\n=== two-frame SfM ===")
    f0, f2 = ds[0], ds[2]
    fe.observe(f0)
    kf = fe.process_to_kf(f0["image"], f0["intrinsics"])
    supp = fe.process_to_supp_kf(f2["image"], f2["intrinsics"])
    dims = np.asarray(kf["regions"].shape[1:], np.float32)
    geo = make_segment_geometry(
        2.0 * kf["keypoints_rc"] / (dims - 1) - 1.0,
        kf["regions"], kf["logdepth_perseg"],
    )
    bundle = build_bundle_np(kf["regions"], kf["logdepth_perseg"])
    src_kf = KeyFrame(image=jnp.asarray(kf["image"]), K=jnp.asarray(kf["K"]),
                      K_img=jnp.asarray(kf["K"]), geo=geo)
    trg_kf = KeyFrame(image=jnp.asarray(supp["image"]), K=jnp.asarray(supp["K"]),
                      K_img=jnp.asarray(supp["K"]))
    src_pyr = keyframe_pyramid(src_kf, 0, 3, bundle=bundle)
    trg_pyr = keyframe_pyramid(trg_kf, 0, 3)
    T_rel = np.linalg.inv(f2["T"]) @ f0["T"]
    T_init = jnp.asarray(T_rel, jnp.float32) @ se3.random(jax.random.PRNGKey(1), sigma=0.03)
    import time as _time

    t0 = _time.perf_counter()
    if args.gn:
        from super_primitive_tpu.solve.two_frame import solve_two_frame_gn

        poses, ld, losses = solve_two_frame_gn(
            src_pyr, [trg_pyr], T_init[None], jnp.zeros(geo.num_segments),
            max_iters=20,
        )
    else:
        poses, ld, losses = solve_two_frame(
            src_pyr, [trg_pyr], T_init[None], jnp.zeros(geo.num_segments),
            TwoFrameConfig(num_iters=300),
        )
    err = float(jnp.linalg.norm(se3.log(
        se3.inverse(jnp.asarray(T_rel, jnp.float32)) @ poses[0])))
    print(f"pose error |log|: {err:.4f} (init noise sigma 0.03, "
          f"{'GN' if args.gn else 'Adam'} {_time.perf_counter() - t0:.1f} s "
          f"incl. compile)")

    from super_primitive_tpu.cost import photometric as ph
    logd = ph.spread_logdepth(bundle, ld, geo.keypoint_base_logdepth())
    pts, _ = keyframe_pointcloud(
        np.asarray(bundle.uv), np.exp(np.asarray(logd)), kf["K"], np.eye(4),
        valid=np.asarray(bundle.valid),
    )
    ply = save_ply(os.path.join(args.out, "sfm_cloud.ply"), pts)
    print(f"point cloud: {ply}")

    # ----------------------------------------------------- 2. odometry
    print("\n=== monocular odometry ===")
    solver = "gn" if args.gn else "adam"
    cfg = load_config({
        "save_path": os.path.join(args.out, "odom"),
        "window_size": 3,
        "aligment": {
            "mono_init": False, "affine_compensation": False,
            "opt_supporting": True, "init_frames": 3,
            "mapping": {"supp_every_n": 3, "init_steps": 60, "steps": 40,
                        "continual_steps": 5, "solver": solver},
            "track": {"solver": solver, "pyramid_min": 0, "pyramid_max": 2,
                      "steps": [0, 250]},
        },
        "kf": {"depth_validity_ratio": 0.60, "translation_thresh": 0.08},
    })
    odom = Odometry(cfg, GridSegmentFrontend(rows=4, cols=5), ds)
    traj = odom.run()
    gt = {ts: ds.poses[int(ts)] for ts in traj}
    if len(traj) >= 3:
        m = ate_rmse(gt, traj)
        print(f"solver={solver}: {len(traj)} keyframes, "
              f"ATE RMSE (Sim3) {m['rmse'] * 1000:.2f} mm")
    else:
        errs = [pose_err(T, ds.poses[int(ts)]) for ts, T in traj.items()]
        print(f"solver={solver}: {len(traj)} keyframes, "
              f"median |log| pose err {np.median(errs):.4f}")
    save_trajectory_plot(os.path.join(args.out, "trajectory.png"),
                         {"estimate": traj, "gt": gt})

    # ------------------------------------------ 3. depth completion
    print("\n=== depth completion ===")
    from super_primitive_tpu.depth_completion.completion import DepthCompletion
    from super_primitive_tpu.depth_completion.metrics import ErrorMetrics
    from test_depth_completion import PatchFrontend

    frame = ds[0]
    gt_depth = frame["depth"]
    r = np.random.default_rng(0)
    sparse = np.zeros_like(gt_depth)
    idx = r.choice(gt_depth.size, 40, replace=False)
    sparse.reshape(-1)[idx] = gt_depth.reshape(-1)[idx]
    dc = DepthCompletion(PatchFrontend(gt_depth, patch=15))
    depth, invalid = dc.depth_completion(frame["image"], frame["intrinsics"], sparse)
    metrics = ErrorMetrics()
    metrics.compute(depth, gt_depth, ~invalid & (gt_depth > 0))
    print(f"completed {np.mean(~invalid) * 100:.0f}% of pixels, "
          f"RMSE {metrics.rmse:.1f} mm")

    print(f"\nartifacts in {args.out}")


if __name__ == "__main__":
    main()
