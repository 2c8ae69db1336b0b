"""GN/LM mapping benchmark at TUM odom_desk scale.

Builds a synthetic 5-keyframe window (240x320, ~300 segments/KF, full point
coverage, 2 supporting frames per KF) matching the reference mapping workload
(odometery.py:687-985, config/tum/odom_desk.yaml: window_size 5) and times:

  - gn_mapping (LM + scalar-landmark Schur), per-LM-iteration latency;
  - run_mapping Adam parity path, per-iteration latency;
  - run_supp_refinement_gn (per-frame logdepth refinement).

Timing discipline: the axon relay does not honor block_until_ready for all
graphs; every timing fetches a scalar.  Run alone on the chip.

Usage: python examples/bench_mapping.py [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_window(H=240, W_img=320, n_kf=5, n_seg=304, supp_cap=2,
                 seg_cap=480, point_cap=76800):
    import jax.numpy as jnp

    from super_primitive_tpu.keyframe import build_bundle_np
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.odometry import window

    r = np.random.default_rng(7)
    K = np.array([[260.0, 0, W_img / 2], [0, 260.0, H / 2], [0, 0, 1.0]], np.float32)

    rows, cols = 16, 19
    regions = np.zeros((n_seg, H, W_img), bool)
    hs, ws = H // rows, W_img // cols
    kp_rc = np.zeros((n_seg, 2), np.int32)
    i = 0
    for rr in range(rows):
        for cc in range(cols):
            if i >= n_seg:
                break
            regions[i, rr * hs : (rr + 1) * hs, cc * ws : (cc + 1) * ws] = True
            kp_rc[i] = [rr * hs + hs // 2, cc * ws + ws // 2]
            i += 1

    buf = window.empty_window(n_kf, supp_cap, (H, W_img), 3, seg_cap, point_cap)
    for slot in range(n_kf):
        logdepth = (r.uniform(0.3, 0.8, (n_seg, 1, 1)) * regions).astype(np.float32)
        bundle = build_bundle_np(regions, logdepth, capacity=point_cap)
        kp_base = logdepth[np.arange(n_seg), kp_rc[:, 0], kp_rc[:, 1]]
        pose = np.asarray(
            se3.exp(jnp.asarray(0.03 * r.normal(size=6).astype(np.float32)))
        )
        img = r.uniform(0, 1, (H, W_img, 3)).astype(np.float32)
        buf = window.set_keyframe_slot(
            buf, slot, img, K, pose,
            kp_base + r.normal(0, 0.02, n_seg).astype(np.float32),
            np.zeros(2, np.float32),
            np.asarray(bundle.uv), np.asarray(bundle.seg_id),
            np.asarray(bundle.base_logdepth), np.asarray(bundle.valid),
            int(bundle.num_valid), kp_base,
        )
        for j in range(supp_cap):
            s_pose = np.asarray(
                se3.exp(jnp.asarray(0.03 * r.normal(size=6).astype(np.float32)))
            )
            buf = window.set_supporting_slot(
                buf, slot, j, r.uniform(0, 1, (H, W_img, 3)).astype(np.float32),
                s_pose, np.zeros(2, np.float32),
            )
    return buf, (H, W_img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip-adam", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.odometry import mapper
    from super_primitive_tpu.solve.gn_mapping import gn_mapping

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    buf, geo_dims = build_window()
    supp_valid = np.asarray(buf.supp_valid)
    n_kf = buf.capacity
    slots = mapper.build_slots(n_kf, buf.capacity, supp_valid, "map")
    masks = mapper.build_masks(
        n_kf, buf.capacity, supp_valid, "map", buf.capacity, True, True
    )
    sargs = (
        jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
        jnp.asarray(slots.src_valid),
        jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
        jnp.asarray(masks.affine_mask),
    )

    # --- GN mapping: assemble-path / tap-dtype / point-stride A/Bs ---
    for tap_dtype, stride, factored in (
        (None, 1, True), (None, 1, False), (None, 2, True), (None, 4, True),
    ):
        def run_gn():
            return gn_mapping(
                buf, *sargs, geo_dims, max_iters=args.iters, use_affine=True,
                tol=0.0,  # run all iters for stable timing
                tap_dtype=tap_dtype, point_stride=stride, factored=factored,
            )

        t0 = time.perf_counter()
        res = run_gn()
        sync(res.final_cost)
        compile_s = time.perf_counter() - t0
        iters = int(res.num_iters)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run_gn()
            sync(res.final_cost)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"gn_mapping[taps={tap_dtype or 'f32'}, stride={stride}, "
            f"factored={factored}]: "
            f"{1000 * dt:.1f} ms / solve ({iters} LM iters, "
            f"{1000 * dt / max(iters, 1):.1f} ms/iter; compile+run1 {compile_s:.1f} s; "
            f"cost {float(res.initial_cost):.4f} -> {float(res.final_cost):.4f})"
        )

    # --- supp refinement GN ---
    i = n_kf - 1
    def run_supp():
        return mapper.run_supp_refinement_gn(
            buf, jnp.asarray(i),
            jnp.asarray(slots.trg_index[i]), jnp.asarray(slots.trg_valid[i]),
            False, geo_dims,
        )

    sync(run_supp()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run_supp()[0])
        times.append(time.perf_counter() - t0)
    print(f"supp_refinement_gn: {1000 * min(times):.1f} ms")

    if args.skip_adam:
        return

    # --- Adam parity path (100 iters, scaled to per-iter) ---
    def run_adam():
        return mapper.run_mapping(
            buf, *sargs,
            jnp.asarray(1e-4), jnp.asarray(1e-2), jnp.asarray(1e-5),
            jnp.asarray(100), jnp.asarray(False), True, geo_dims,
        )

    sync(run_adam().params.kp_logdepth)
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        sync(run_adam().params.kp_logdepth)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"adam_mapping: {1000 * dt:.1f} ms / 100 iters ({10 * dt:.1f} ms/iter; "
        f"map-500 projected {5 * dt:.1f} s)"
    )


if __name__ == "__main__":
    main()
