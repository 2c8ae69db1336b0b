"""Benchmark: per-keyframe optimization throughput at TUM odom_desk scale.

Workload mirrors the reference's tracking hot loop (odometery.py:323-448,
config/tum/odom_desk.yaml): 300 retraction-Adam iterations of the dense
photometric cost (pose delta + affine) against one target frame, geometry at
240x320 with ~300 segments (~full-image point coverage), image 240x320.
The whole 300-iteration loop runs as a single on-device lax.scan.

Baseline: the reference publishes no numbers (BASELINE.md); its tracking
loop on an RTX 4090 is a torch Adam loop with ~20 kernel launches + autograd
per iteration over ~77k points.  We pin a nominal 300 iter/s (≈1 s per
tracked frame) as the documented estimate until the reference is profiled;
``vs_baseline`` is ours / 300.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.cost import photometric as ph
    from super_primitive_tpu.keyframe import build_bundle_np, make_segment_geometry
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.solve.retraction_adam import (
        OptParams,
        make_optimizer,
        run_adam,
    )

    # --- TUM odom_desk-scale synthetic workload ---
    H, W = 240, 320
    N_SEG = 304          # ~300+100 SAM points -> ~300 surviving segments
    r = np.random.default_rng(42)
    K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1.0]], np.float32)

    # tile segments over the image (full coverage like real SAM masks)
    rows, cols = 16, 19
    regions = np.zeros((N_SEG, H, W), bool)
    hs, ws = H // rows, W // cols
    i = 0
    for rr in range(rows):
        for cc in range(cols):
            if i >= N_SEG:
                break
            regions[i, rr * hs : (rr + 1) * hs, cc * ws : (cc + 1) * ws] = True
            i += 1
    logdepth = (r.uniform(0.3, 0.8, (N_SEG, 1, 1)) * regions).astype(np.float32)
    kp_px = np.zeros((N_SEG, 2), np.float32)
    i = 0
    for rr in range(rows):
        for cc in range(cols):
            if i >= N_SEG:
                break
            kp_px[i] = [rr * hs + hs // 2, cc * ws + ws // 2]
            i += 1
    keypoints = (2 * kp_px / (np.asarray([H, W], np.float32) - 1) - 1).astype(np.float32)

    geo = make_segment_geometry(keypoints, regions, logdepth)
    bundle = build_bundle_np(regions, logdepth, capacity=76800)  # H*W coverage
    src_img = jnp.asarray(r.uniform(0, 1, (H, W, 3)).astype(np.float32))
    trg_img = jnp.asarray(r.uniform(0, 1, (H, W, 3)).astype(np.float32))
    kp_base = geo.keypoint_base_logdepth()
    kp_logdepth = jnp.asarray(r.uniform(0.3, 0.9, (N_SEG,)).astype(np.float32))
    Kj = jnp.asarray(K)
    geo_dims = (H, W)

    src = ph.precompute_source(src_img, bundle, geo_dims)
    T0 = se3.exp(jnp.asarray(0.01 * r.normal(size=(1, 6)).astype(np.float32)))

    # tracking: optimize pose delta + affine, logdepth frozen
    optimizer = make_optimizer(lr_depth=0.0, lr_pose=3e-3, lr_affine=5e-3)

    def loss_fn(poses, kp_ld, affine):
        return ph.photometric_cost(
            bundle, src, trg_img, Kj, geo_dims, kp_ld, kp_base, poses[0],
            affine=(jnp.zeros(2), affine[0]),
        )

    NUM_ITERS = 300

    # NOTE: no donate_argnums — buffer donation trips an INVALID_ARGUMENT in
    # the axon TPU runtime (verified by bisection); donation saves ~1MB here.
    @jax.jit
    def track(params, opt_state):
        res = run_adam(loss_fn, params, optimizer, opt_state, NUM_ITERS, fold=True)
        return res.params, res.opt_state, res.losses

    def fresh():
        p = OptParams(
            poses=T0, xi=jnp.zeros((1, 6)), kp_logdepth=kp_logdepth,
            affine=jnp.zeros((1, 2)),
        )
        return p, optimizer.init(p)

    # warmup/compile.  NOTE: under the axon TPU relay, block_until_ready
    # does not reliably block for all graphs (verified empirically); fetching
    # a scalar to host forces completion, so all timings materialize one.
    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    p, s = fresh()
    out = track(p, s)
    sync(out)

    times = []
    for _ in range(3):
        p, s = fresh()
        sync((p, s))
        t0 = time.perf_counter()
        out = track(p, s)
        sync(out)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    iters_per_sec = NUM_ITERS / dt
    import sys

    print(
        f"[secondary] adam_track_iters_per_sec={iters_per_sec:.1f} "
        f"({1000 * dt:.1f} ms / {NUM_ITERS}-iter keyframe)",
        file=sys.stderr,
    )

    # --- primary: GN/LM per-keyframe tracking latency (the performance
    # path; accuracy-equivalent to Adam-300 per tests/test_gauss_newton) ---
    from super_primitive_tpu.solve.gauss_newton import gn_track

    R0 = T0[0]

    def run_gn():
        return gn_track(
            bundle, src, trg_img, Kj, kp_logdepth, kp_base, R0,
            jnp.zeros(2), jnp.zeros(2), geo_dims,
            max_iters=20, use_affine=True,
        )

    sync(run_gn())  # compile
    gn_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(run_gn())
        gn_times.append(time.perf_counter() - t0)
    gn_ms = 1000 * min(gn_times)

    # reference baseline: per-frame 'tracking time' print around the 300-iter
    # Adam loop on an RTX 4090 — estimated 1000 ms (BASELINE.md: re-derive by
    # profiling the reference; repo publishes no numbers)
    baseline_ms = 1000.0
    print(
        json.dumps(
            {
                "metric": "track_keyframe_ms",
                "value": round(gn_ms, 2),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / gn_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
