"""Two-frame SfM benchmark at Replica working scale (VERDICT r1 #8).

Synthetic textured plane at 240x320 with a 6x8 segment grid, 3-level
pyramid; compares

  - solve_two_frame (Adam parity path: 3 x 500 iterations, reference
    two_frame_sfm.py:117-207 semantics), and
  - solve_two_frame_gn (LM + scalar-landmark Schur, tens of iterations),

on wall time and final pose error from the same noised-GT init.

    python examples/bench_twoframe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from synthetic import plane_keyframes

    from super_primitive_tpu.keyframe import keyframe_pyramid
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.solve.two_frame import (
        TwoFrameConfig,
        solve_two_frame,
        solve_two_frame_gn,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    src_kf, trg_kf, bundle, T_true, depth = plane_keyframes(
        H=240, W=320, rows=6, cols=8
    )
    src_pyr = keyframe_pyramid(src_kf, 0, 3, bundle=bundle)
    trg_pyr = keyframe_pyramid(trg_kf, 0, 3)
    T_init = se3.retract(
        T_true, jnp.asarray([0.02, -0.02, 0.015, -0.03, 0.04, 0.03])
    )[None]
    N = src_pyr.geo.num_segments
    ld_init = jnp.full((N,), 0.2)

    def pose_err(T):
        return float(jnp.linalg.norm(se3.log(se3.inverse(T_true) @ T)))

    def scale_free_err(T):
        """(rotation error rad, translation direction angle rad) — the
        monocular-observable part; absolute translation scale is gauge
        (coupled to global depth scale)."""
        import numpy as _np

        T = _np.asarray(T)
        Tt = _np.asarray(T_true)
        dR = Tt[:3, :3].T @ T[:3, :3]
        rot = float(_np.arccos(_np.clip((_np.trace(dR) - 1) / 2, -1, 1)))
        a = T[:3, 3] / max(_np.linalg.norm(T[:3, 3]), 1e-12)
        b = Tt[:3, 3] / max(_np.linalg.norm(Tt[:3, 3]), 1e-12)
        ang = float(_np.arccos(_np.clip(a @ b, -1, 1)))
        return rot, ang

    # --- GN path ----------------------------------------------------------
    t0 = time.perf_counter()
    poses, ld, losses = solve_two_frame_gn(
        src_pyr, [trg_pyr], T_init, ld_init, max_iters=20
    )
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        poses, ld, losses = solve_two_frame_gn(
            src_pyr, [trg_pyr], T_init, ld_init, max_iters=20
        )
        times.append(time.perf_counter() - t0)
    rot, ang = scale_free_err(poses[0])
    print(
        f"two_frame GN: {min(times):.2f} s warm (compile+run1 {compile_s:.0f} s); "
        f"pose err {pose_err(poses[0]):.5f} vs init {pose_err(T_init[0]):.5f} "
        f"(scale-free: rot {rot:.5f} rad, t-dir {ang:.5f} rad); "
        f"cost {losses[0][0]:.4f} -> {losses[-1][1]:.4f}", flush=True,
    )

    # --- Adam parity path -------------------------------------------------
    cfg = TwoFrameConfig(num_iters=500)
    t0 = time.perf_counter()
    poses_a, _, hist = solve_two_frame(src_pyr, [trg_pyr], T_init, ld_init, cfg)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    poses_a, _, hist = solve_two_frame(src_pyr, [trg_pyr], T_init, ld_init, cfg)
    adam_s = time.perf_counter() - t0
    iters = 3 * cfg.num_iters
    rot_a, ang_a = scale_free_err(poses_a[0])
    print(
        f"two_frame Adam (3x500): {adam_s:.2f} s warm ({iters/adam_s:.0f} it/s; "
        f"compile+run1 {compile_s:.0f} s); pose err {pose_err(poses_a[0]):.5f} "
        f"(scale-free: rot {rot_a:.5f} rad, t-dir {ang_a:.5f} rad)",
        flush=True,
    )
    print(
        f"speedup: {adam_s/min(times):.1f}x wall; NOTE absolute pose error is "
        "gauge-limited (monocular depth/translation scale) — compare the "
        "scale-free components", flush=True,
    )


if __name__ == "__main__":
    main()
