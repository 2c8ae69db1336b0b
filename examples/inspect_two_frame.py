"""Inspect-a-running-solve demo: two-frame SfM with snapshot replay.

The reference streams every optimizer iteration to its Open3D GUI
(odometery/two_frame_sfm.py:175-183).  Headless equivalent: run the same
coarse-to-fine solve with periodic snapshots (solve/two_frame.py
``snapshot_cb`` — identical trajectory, chunked scans) and export ONE
dependency-free HTML file with a WebGL point cloud per snapshot on a
timeline slider plus the loss value (viz/viewer.py).

Usage: python examples/inspect_two_frame.py [--out /tmp/sp_inspect.html]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sp_inspect.html")
    ap.add_argument("--every", type=int, default=100)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:  # sitecustomize pins the axon TPU; env vars don't override
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from synthetic import plane_keyframes

    from super_primitive_tpu.cost import photometric as ph
    from super_primitive_tpu.keyframe import keyframe_pyramid
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.solve.two_frame import (
        TwoFrameConfig,
        solve_two_frame,
    )
    from super_primitive_tpu.viz.export import keyframe_pointcloud
    from super_primitive_tpu.viz.viewer import save_html_viewer

    H, W = 64, 96
    src_kf, trg_kf, bundle, T_true, depth = plane_keyframes(
        H, W, rows=4, cols=5, base_logdepth=float(np.log(2.0))
    )
    geo = src_kf.geo
    src_pyr = keyframe_pyramid(src_kf, 0, 3, bundle=bundle)
    trg_pyr = keyframe_pyramid(trg_kf, 0, 3)
    T_init = T_true @ se3.exp(
        0.05 * jax.random.normal(jax.random.PRNGKey(3), (6,))
    )

    src = ph.precompute_source(src_kf.image, bundle, geo.geo_dims)
    colors = np.asarray(src.pixels[..., :3])
    valid = np.asarray(src.valid)
    uv = np.asarray(bundle.uv)
    K = np.asarray(src_kf.K)
    kp_base = geo.keypoint_base_logdepth()

    def cloud_of(kp_logdepth):
        logd = ph.spread_logdepth(bundle, kp_logdepth, kp_base)
        z = np.asarray(jnp.exp(logd))
        pts, cols = keyframe_pointcloud(
            uv, z, K, np.eye(4), colors=colors, valid=valid
        )
        return pts, cols

    frames = []

    def snapshot(level, iters_done, params, chunk_losses):
        pts, cols = cloud_of(params.kp_logdepth)
        frames.append(
            {
                "label": f"level {level} iter {iters_done}",
                "loss": float(np.asarray(chunk_losses)[-1]),
                "clouds": {"estimate": (pts, cols)},
            }
        )
        print(f"  snapshot level={level} iters={iters_done} "
              f"loss={frames[-1]['loss']:.5f}")

    cfg = TwoFrameConfig(num_iters=300)
    poses, kp_ld, losses = solve_two_frame(
        src_pyr, [trg_pyr], T_init[None],
        jnp.full((geo.num_segments,), float(np.log(2.0))),
        cfg, snapshot_cb=snapshot, snapshot_every=args.every,
    )

    # ground truth cloud (true plane) for visual comparison
    gt_pts, gt_cols = cloud_of(jnp.full((geo.num_segments,), float(np.log(depth))))
    gt_cols = (np.asarray(gt_cols) * 0.3 + np.asarray([0, 0.6, 0])).clip(0, 1)

    path = save_html_viewer(
        args.out,
        clouds={"ground truth (green)": (gt_pts, gt_cols)},
        trajectories={
            "camera": np.stack([
                np.zeros(3), np.asarray(se3.inverse(poses[0]))[:3, 3]
            ])
        },
        frames=frames,
        title="two-frame SfM solve replay",
    )
    err = float(jnp.linalg.norm(se3.log(se3.inverse(T_true) @ poses[0])))
    print(f"final pose tangent error: {err:.5f}")
    print(f"viewer written: {path} ({len(frames)} snapshots)")
    assert err < 0.05, err


if __name__ == "__main__":
    main()
