#!/usr/bin/env python
"""Headless SfM / odometry runner (reference entry: sfm_gui_runner.py).

Two-frame SfM:  python run_sfm.py --config config/replica_sfm_example.yaml
Monocular VO:   python run_sfm.py --config config/tum/odom_desk.yaml --odom

The Open3D GUI is replaced by artifact export (PLY point clouds, residual
PNGs, trajectory plots/json) under the config's save_path.

Frontend selection: with converted SAM/NNET checkpoints (--sam-ckpt /
--nnet-ckpt, .npz trees from nets/convert.py) the full perception frontend
runs; with --stub-frontend the GT-depth segment-grid stub is used, which
needs dataset depth (SURVEY §7.2.4's precomputed-frontend mode).
"""

import argparse
import os
import random

import numpy as np


def seed_everything(seed=42):
    # reference seeds (sfm_gui_runner.py:14-18)
    np.random.seed(seed)
    random.seed(seed)


def build_frontend_from_args(args, config):
    if args.stub_frontend:
        from super_primitive_tpu.frontend.stub import GridSegmentFrontend

        return GridSegmentFrontend(
            rows=args.stub_rows, cols=args.stub_cols,
            downsample_pow=config.frontend.downsample_pow,
        )
    from super_primitive_tpu.frontend.process_frame import build_frontend

    sam_tree = np.load(args.sam_ckpt, allow_pickle=True)["tree"].item() if args.sam_ckpt else None
    nnet_tree = np.load(args.nnet_ckpt, allow_pickle=True)["tree"].item() if args.nnet_ckpt else None
    return build_frontend(config, sam_tree, nnet_tree)


def window_clouds(odom, with_seg=False):
    """Lift the odometry window's keyframes to world-frame colored clouds:
    {kfN: (points, colors[, seg_ids])}.  ``with_seg`` attaches per-point
    segment ids so the HTML viewer's click-to-pick segment interaction works
    (the reference GUI's picker, gui/odometery_gui.py:397-422)."""
    from super_primitive_tpu.viz.export import keyframe_pointcloud

    buf = odom.buffers
    clouds = {}
    kp_ld = np.asarray(buf.kp_logdepth)
    kp_base = np.asarray(buf.kp_base)
    for i in range(odom.num_kfs):
        uv = np.asarray(buf.uv[i])
        seg = np.asarray(buf.seg_id[i])
        base = np.asarray(buf.base_logdepth[i])
        valid = np.asarray(buf.point_valid[i])
        logd = base + (kp_ld[i] - kp_base[i])[seg]
        img = np.asarray(buf.images[i])
        cols = img.reshape(-1, img.shape[-1])[:, :3][
            np.clip(
                np.round(uv[:, 1]).astype(int) * img.shape[1]
                + np.round(uv[:, 0]).astype(int),
                0, img.shape[0] * img.shape[1] - 1,
            )
        ]
        pts, _ = keyframe_pointcloud(
            uv, np.exp(logd), np.asarray(buf.K[i]),
            np.asarray(buf.poses[i]), valid=valid,
        )
        clouds[f"kf{i}"] = (
            (pts, cols[valid], seg[valid]) if with_seg else (pts, cols[valid])
        )
    return clouds


def track_positions(odom):
    return np.asarray(
        [np.asarray(T)[:3, 3] for _, T in sorted(
            odom.global_track_trajectory.items(), key=lambda kv: int(kv[0])
        )]
    )


def make_odometry_live_cb(live_dir):
    """Per-frame live snapshot for the odometry driver: current window
    point clouds + tracked trajectory, then honor the pause marker."""
    from super_primitive_tpu.viz.live import LiveViz

    lv = LiveViz(live_dir, title="odometry (live)")

    def cb(odom, frame_id):
        traj = track_positions(odom)
        lv.update(
            window_clouds(odom),
            trajectories={"track": traj} if len(traj) >= 2 else None,
            label=f"frame {frame_id} | {odom.num_kfs} KFs",
        )
        paused = lv.checkpoint()
        if paused > 0.5:
            print(f"[live] paused {paused:.1f}s", flush=True)

    return cb


def run_two_frame(config, frontend, dataset, live_dir=None, live_every=50):
    import jax.numpy as jnp

    from super_primitive_tpu.keyframe import (
        KeyFrame, build_bundle_np, keyframe_pyramid, make_segment_geometry,
    )
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.solve.two_frame import (
        TwoFrameConfig, random_depth_seeds, solve_two_frame,
    )
    import jax

    src = dataset[config.dataset.source_id]
    trg = dataset[config.dataset.target_id]

    observe = getattr(frontend, "observe", None)
    if observe:
        observe(src)
    kf_data = frontend.process_to_kf(src["image"], src["intrinsics"])
    supp = frontend.process_to_supp_kf(trg["image"], trg["intrinsics"])

    geo = make_segment_geometry(
        2.0 * kf_data["keypoints_rc"] / (np.asarray(kf_data["regions"].shape[1:]) - 1) - 1.0,
        kf_data["regions"], kf_data["logdepth_perseg"],
    )
    bundle = build_bundle_np(kf_data["regions"], kf_data["logdepth_perseg"])
    src_kf = KeyFrame(
        image=jnp.asarray(kf_data["image"]), K=jnp.asarray(kf_data["K"]),
        K_img=jnp.asarray(kf_data["K"]), geo=geo,
    )
    trg_kf = KeyFrame(
        image=jnp.asarray(supp["image"]), K=jnp.asarray(supp["K"]),
        K_img=jnp.asarray(supp["K"]),
    )
    lo, hi = config.alignment.pyramid_min, config.alignment.pyramid_max
    src_pyr = keyframe_pyramid(src_kf, lo, hi, bundle=bundle)
    trg_pyr = keyframe_pyramid(trg_kf, lo, hi)

    # GT pose + exp-noise init (two_frame_sfm.py:73-84)
    T_rel = np.linalg.inv(trg["T"]) @ src["T"]
    key = jax.random.PRNGKey(42)
    noise = se3.random(key, sigma=0.05)
    T_init = jnp.asarray(T_rel, jnp.float32) @ noise

    cfg = TwoFrameConfig()
    ld0 = random_depth_seeds(jax.random.PRNGKey(43), geo.num_segments, cfg)

    snapshot_cb = snapshot_every = None
    if live_dir:
        from super_primitive_tpu.cost import photometric as _ph
        from super_primitive_tpu.viz.export import keyframe_pointcloud
        from super_primitive_tpu.viz.live import LiveViz

        lv = LiveViz(live_dir, title="two-frame SfM (live)")
        kp_base = geo.keypoint_base_logdepth()

        def snapshot_cb(level, iters_done, params, chunk_losses):
            logd = np.asarray(
                _ph.spread_logdepth(bundle, params.kp_logdepth, kp_base)
            )
            pts, _ = keyframe_pointcloud(
                np.asarray(bundle.uv), np.exp(logd), kf_data["K"],
                np.eye(4), valid=np.asarray(bundle.valid),
            )
            lv.update(
                {"src": (pts, None)},
                label=f"level {level} iter {iters_done}",
                loss=float(np.asarray(chunk_losses)[-1]),
            )
            lv.checkpoint()  # pause protocol (two_frame_sfm.py:185-198)

        snapshot_every = max(1, live_every)

    if config.alignment.mapping.solver == "gn":
        # LM + Schur performance path (solve/gn_mapping.py), selected the
        # same way as odometry's mapping solver: alignment.mapping.solver
        from super_primitive_tpu.solve.two_frame import solve_two_frame_gn

        if live_dir:
            print("[live] note: per-iteration snapshots are an Adam-path "
                  "feature; the GN solve publishes no live frames")
        poses, ld, gn_losses = solve_two_frame_gn(
            src_pyr, [trg_pyr], T_init[None], ld0,
            max_iters=config.alignment.mapping.gn_max_iters,
        )
        losses = [jnp.asarray([init, final]) for init, final in gn_losses]
    else:
        poses, ld, losses = solve_two_frame(
            src_pyr, [trg_pyr], T_init[None], ld0, cfg,
            snapshot_cb=snapshot_cb, snapshot_every=snapshot_every or 0,
        )

    out_dir = config.save_path
    os.makedirs(out_dir, exist_ok=True)
    from super_primitive_tpu.cost import photometric as ph
    from super_primitive_tpu.viz.export import keyframe_pointcloud, save_ply

    logd = ph.spread_logdepth(bundle, ld, geo.keypoint_base_logdepth())
    pts, _ = keyframe_pointcloud(
        np.asarray(bundle.uv), np.exp(np.asarray(logd)), kf_data["K"],
        np.eye(4), valid=np.asarray(bundle.valid),
    )
    save_ply(os.path.join(out_dir, "src_pointcloud.ply"), pts)
    from super_primitive_tpu.viz.viewer import save_html_viewer

    save_html_viewer(
        os.path.join(out_dir, "viewer.html"),
        {"src": (pts, None, np.asarray(bundle.seg_id)[np.asarray(bundle.valid)])},
        title="two-frame SfM result (click a point to pick its segment)",
    )
    np.savez(
        os.path.join(out_dir, "two_frame_result.npz"),
        pose=np.asarray(poses[0]), kp_logdepth=np.asarray(ld),
        losses=[np.asarray(l) for l in losses][-1],
        T_rel_gt=T_rel,
    )
    final_loss = float(losses[-1][-1])
    err = np.asarray(se3.log(se3.inverse(jnp.asarray(T_rel, jnp.float32)) @ poses[0]))
    print(f"two-frame SfM done: final loss {final_loss:.5f}, "
          f"pose err |log| {np.linalg.norm(err):.4f}")
    print(f"artifacts in {out_dir}")


def run_odometry(config, frontend, dataset, max_frames=None, live_dir=None):
    from super_primitive_tpu.eval.trajectory import ate_rmse
    from super_primitive_tpu.odometry.odometry import Odometry
    from super_primitive_tpu.viz.export import save_trajectory_plot

    odom = Odometry(config, frontend, dataset)
    if live_dir:
        odom.live_cb = make_odometry_live_cb(live_dir)
        print(f"[live] serve with: python -m super_primitive_tpu.viz.serve "
              f"{live_dir}  ->  http://localhost:8765/live.html", flush=True)
    traj = odom.run(max_frames=max_frames)

    # final interactive map: window clouds with pickable segments
    from super_primitive_tpu.viz.viewer import save_html_viewer

    tp = track_positions(odom)
    save_html_viewer(
        os.path.join(config.save_path, "viewer.html"),
        window_clouds(odom, with_seg=True),
        trajectories={"track": tp} if len(tp) >= 2 else None,
        title="odometry final window (click a point to pick its segment)",
    )

    # TUM-format export for external evo if desired (convert_traj_to_tum.py)
    from super_primitive_tpu.odometry.io import export_tum_trajectory

    out = config.save_path
    export_tum_trajectory(
        traj, odom.frame_timestamps, os.path.join(out, "converted_tum_traj.txt")
    )
    gt_traj = {}
    for ts in traj:
        T = dataset[int(ts)].get("T")
        if T is not None:
            gt_traj[ts] = T
    if len(gt_traj) >= 3:
        export_tum_trajectory(
            gt_traj, odom.frame_timestamps,
            os.path.join(out, "converted_gt_tum_traj.txt"),
        )
        m = ate_rmse(gt_traj, traj, align_scale=True)
        print(f"ATE RMSE (Sim3): {m['rmse']:.4f} m over {m['n']} KFs "
              f"(scale {m['scale']:.3f})")
        save_trajectory_plot(
            os.path.join(out, "trajectory.png"),
            {"estimate": traj, "gt": gt_traj},
        )
    print(f"artifacts in {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--odom", action="store_true")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--sam-ckpt", default=None, help=".npz converted SAM tree")
    ap.add_argument("--nnet-ckpt", default=None, help=".npz converted NNET tree")
    ap.add_argument("--stub-frontend", action="store_true")
    ap.add_argument("--stub-rows", type=int, default=6)
    ap.add_argument("--stub-cols", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the container sitecustomize "
                         "pins the axon TPU; env vars alone don't override)")
    ap.add_argument("--live-viz", default=None, metavar="DIR",
                    help="write live during-solve snapshots (live.html + "
                         "live.json) to DIR; pair with `python -m "
                         "super_primitive_tpu.viz.serve DIR` for a live "
                         "browser view with pause/resume")
    ap.add_argument("--live-every", type=int, default=50,
                    help="two-frame Adam solve: publish a live snapshot "
                         "every N optimizer iterations (1 = the reference's "
                         "per-iteration cadence, two_frame_sfm.py:178-183; "
                         "each snapshot costs a host round-trip, which is "
                         "why the default batches 50)")
    args = ap.parse_args()

    seed_everything()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_primitive_tpu.config import load_config
    from super_primitive_tpu.data import load_dataset

    config = load_config(args.config)
    dataset = load_dataset({"dataset": {
        "type": config.dataset.type, "path": config.dataset.path,
        "traj_file": config.dataset.traj_file,
        "normals_path": config.dataset.normals_path,
        "intrinsics": config.dataset.intrinsics,
    }})
    frontend = build_frontend_from_args(args, config)

    if args.odom:
        run_odometry(config, frontend, dataset, args.max_frames,
                     live_dir=args.live_viz)
    else:
        run_two_frame(config, frontend, dataset, live_dir=args.live_viz,
                      live_every=args.live_every)


if __name__ == "__main__":
    main()
