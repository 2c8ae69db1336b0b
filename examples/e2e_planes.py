#!/usr/bin/env python
"""Reproducible TUM-scale end-to-end run (VERDICT r1 #6a + #9).

20 synthetic frames at 480x640 (keyframes at 240x320, the TUM odom_desk
working resolution) through the FULL production code path:

  structured-fake SAM (coherent Voronoi blobs) -> REAL two-round mask
  generation (stability/NMS/active resampling/coarse edges) -> analytic
  scene normals -> REAL BiNI crop/full-routed integration ->
  depth-discontinuity CC split -> GN tracking (fused one-dispatch frames) ->
  windowed GN mapping -> Sim(3) ATE.

Asserts the final ATE and prints per-stage timings.  Runs on whatever
backend JAX picks (the real TPU chip under axon; CPU with JAX_PLATFORMS=cpu).

    python examples/e2e_planes.py [--frames 20] [--ate-tol 0.05]

Reference workload being mirrored: README.md:49-70 (TUM fr1 odometry) with
frontend/process_frame.py:207-255 perception.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--ate-tol", type=float, default=0.05)
    ap.add_argument("--solver", choices=("gn", "adam", "both"), default="gn",
                    help="'both' runs the sequence once per solver and "
                         "prints the ATE comparison (the GN==Adam accuracy "
                         "evidence at full-pipeline scale)")
    ap.add_argument("--gn-iters", type=int, default=30)
    ap.add_argument("--point-stride", type=int, default=1,
                    help="gn_point_stride for the mapping solver (speed/"
                         "accuracy knob; 1 = exact reference objective)")
    ap.add_argument("--small", action="store_true",
                    help="96x128 debug scale instead of TUM scale")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the container sitecustomize "
                         "pins the axon TPU; env vars alone don't switch)")
    ap.add_argument("--path", choices=("auto", "linear", "orbit"),
                    default="auto",
                    help="camera trajectory: 'linear' (constant twist; "
                         "degenerates past ~60 frames as the camera closes "
                         "on the floor panel) or 'orbit' (bounded wander, "
                         "valid for any length).  auto = orbit when "
                         "--frames > 40")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run each solver N times and report the LAST run "
                         "(in-process warm-cache walls: first runs pay the "
                         "one-time XLA compiles, polluting solver A/Bs)")
    ap.add_argument("--host-sam", action="store_true",
                    help="use the host-numpy FakeSAM (legacy slow path) "
                         "instead of the device-side Voronoi fake through "
                         "the production select/NMS protocol")
    ap.add_argument("--restore-split", type=int, default=0,
                    help="N > 0: run to frame N, save_state, resume a FRESH "
                         "Odometry from the checkpoint and finish the "
                         "sequence — asserts trajectory continuity across "
                         "the restore (odometery.py:1018-1162 semantics)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_primitive_tpu.data.synthetic import PlanesSequence
    from super_primitive_tpu.eval.trajectory import ate_rmse
    from super_primitive_tpu.frontend.fakes import StructuredFakeFrontend
    from super_primitive_tpu.odometry.odometry import Odometry

    print(f"[e2e] backend: {jax.default_backend()}")
    if args.small:
        H, W, n_cells = 96, 128, 24
    else:
        H, W, n_cells = 480, 640, 64  # KF at 240x320 like TUM fr1

    def make_cfg(solver):
        # single source of truth for the e2e shapes — bench.py's
        # e2e_steady_state leg uses the same helper so both hit identical
        # jit signatures (shared persistent compile cache)
        from super_primitive_tpu.eval.e2e_synthetic import make_e2e_config

        return make_e2e_config(
            solver, small=args.small, gn_iters=args.gn_iters,
            point_stride=args.point_stride,
        )

    path = args.path
    if path == "auto":
        path = "orbit" if args.frames > 40 else "linear"
    ds = PlanesSequence(n_frames=args.frames, H=H, W=W, path=path)
    print(f"[e2e] trajectory path: {path}")

    def run_one(solver):
        cfg = make_cfg(solver)
        fe = StructuredFakeFrontend(cfg, seed=0, n_cells=n_cells,
                                    device_sam=not args.host_sam)
        odom = Odometry(cfg, fe, ds)
        t0 = time.perf_counter()
        if args.restore_split > 0:
            split = args.restore_split
            assert 3 < split < args.frames, "--restore-split inside sequence"
            odom.run(max_frames=split)
            tag_id = split - 1  # last processed frame
            odom.save_state(tag=odom.id_to_timestamp(tag_id))
            n_pre = len(odom.global_track_trajectory)
            # resume a FRESH process-equivalent: new Odometry, new frontend
            # state, window reloaded from the npz checkpoint
            import dataclasses as _dc

            from super_primitive_tpu.config.schema import RestoreConfig

            cfg2 = _dc.replace(
                cfg, restore=RestoreConfig(path=cfg.save_path, frame_id=tag_id)
            )
            fe2 = StructuredFakeFrontend(cfg2, seed=0, n_cells=n_cells,
                                         device_sam=not args.host_sam)
            odom = Odometry(cfg2, fe2, ds)
            traj = odom.run()
            print(f"[e2e:{solver}] restore split at frame {split}: "
                  f"{n_pre} pre-restore tracked frames reloaded, "
                  f"{len(odom.global_track_trajectory) - n_pre} tracked after")
        else:
            traj = odom.run()
        wall = time.perf_counter() - t0

        est = {ts: np.asarray(T) for ts, T in odom.global_track_trajectory.items()}
        gt = {ts: np.asarray(ds.poses[int(float(ts))], np.float32) for ts in est}
        ate = ate_rmse(gt, est)
        kf_est = {ts: np.asarray(T) for ts, T in traj.items()}
        kf_gt = {ts: np.asarray(ds.poses[int(float(ts))], np.float32) for ts in kf_est}
        kf_ate = ate_rmse(kf_gt, kf_est) if len(kf_est) >= 3 else None

        print(f"\n[e2e:{solver}] {len(ds)} frames, {len(traj)} keyframes, "
              f"{wall:.1f} s wall ({wall / max(len(ds) - 1, 1):.2f} s/frame "
              f"incl. frontend+mapping)")
        print(f"[e2e:{solver}] Sim(3) ATE (all tracked frames): "
              f"rmse={ate['rmse']:.4f} median={ate['median']:.4f} "
              f"max={ate['max']:.4f}")
        if kf_ate:
            print(f"[e2e:{solver}] Sim(3) ATE (keyframes): rmse={kf_ate['rmse']:.4f}")
        print("\n[timing]\n" + odom.timer.report())
        return ate, wall

    solvers = ("gn", "adam") if args.solver == "both" else (args.solver,)
    results = {}
    for s in solvers:
        for rep in range(args.repeat):
            if args.repeat > 1:
                print(f"\n[e2e] ===== {s} run {rep + 1}/{args.repeat} =====")
            results[s] = run_one(s)

    if args.solver == "both":
        ate_gn, w_gn = results["gn"]
        ate_ad, w_ad = results["adam"]
        print(f"\n[e2e] solver comparison (full pipeline, {len(ds)} frames):")
        print(f"  adam: ATE {ate_ad['rmse']:.4f}  wall {w_ad:.1f} s")
        print(f"  gn:   ATE {ate_gn['rmse']:.4f}  wall {w_gn:.1f} s "
              f"(ATE ratio {ate_gn['rmse'] / max(ate_ad['rmse'], 1e-12):.3f}, "
              f"{w_ad / max(w_gn, 1e-9):.2f}x faster)")
        assert ate_gn["rmse"] <= 1.1 * ate_ad["rmse"] or ate_gn["rmse"] < args.ate_tol

    for s, (ate, _) in results.items():
        assert ate["rmse"] < args.ate_tol, (
            f"[{s}] ATE {ate['rmse']:.4f} exceeds tolerance {args.ate_tol}"
        )
    summary = ", ".join(
        f"{s}: ATE {a[0]['rmse']:.4f}" for s, a in results.items()
    )
    print(f"\n[e2e] PASS ({summary} < {args.ate_tol})")


if __name__ == "__main__":
    main()
