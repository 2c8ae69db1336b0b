"""GN/LM tracking tests: convergence speed + accuracy vs retraction-Adam."""

import time

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.cost import photometric as ph
from super_primitive_tpu.image import pyramid as pyr
from super_primitive_tpu.keyframe import build_bundle_np, make_segment_geometry
from super_primitive_tpu.lie import se3
from super_primitive_tpu.odometry import tracker
from super_primitive_tpu.solve.gauss_newton import gn_track, gn_track_frame

from synthetic import plane_keyframes


def setup_problem(H=64, W=96):
    src_kf, trg_kf, bundle, T_true, depth = plane_keyframes(
        H=H, W=W, base_logdepth=float(np.log(2.0))
    )
    geo = src_kf.geo
    kp_base = geo.keypoint_base_logdepth()
    kp_ld = kp_base  # GT depth
    geo_dims = geo.geo_dims
    src = ph.precompute_source(src_kf.image, bundle, geo_dims)
    return src_kf, trg_kf, bundle, src, kp_ld, kp_base, T_true, geo_dims


def pose_err(T_a, T_b):
    return float(jnp.linalg.norm(se3.log(se3.inverse(T_a) @ T_b)))


class TestGNTrack:
    def test_converges_to_gt(self):
        src_kf, trg_kf, bundle, src, kp_ld, kp_base, T_true, geo_dims = setup_problem()
        # relative pose target: R = inv(T_frame) @ T_kf with T_kf = I,
        # T_frame = T_true^-1 (trg rendered at T_true) -> R_true = T_true
        R_init = se3.retract(T_true, jnp.asarray([0.01, -0.015, 0.01, -0.02, 0.03, 0.02]))
        res = gn_track(
            bundle, src, trg_kf.image, src_kf.K, kp_ld, kp_base,
            R_init, jnp.zeros(2), jnp.zeros(2), geo_dims, max_iters=25,
        )
        err0 = pose_err(R_init, T_true)
        err1 = pose_err(res.R, T_true)
        assert err1 < 0.1 * err0, (err0, err1)
        assert float(res.final_cost) < float(res.initial_cost) * 0.2
        assert int(res.num_iters) <= 25

    def test_fewer_iters_than_adam(self):
        """GN reaches Adam-300's accuracy in <= 25 iterations."""
        src_kf, trg_kf, bundle, src, kp_ld, kp_base, T_true, geo_dims = setup_problem()
        kf_pyr = pyr.image_pyramid(src_kf.image, 0, 2)
        trg_pyr = pyr.image_pyramid(trg_kf.image, 0, 2)
        T_init = se3.retract(
            T_true, jnp.asarray([0.01, -0.015, 0.01, -0.02, 0.03, 0.02])
        )

        T_adam, _, _ = tracker.track_frame(
            bundle, kf_pyr, trg_pyr, src_kf.K, kp_ld, kp_base,
            jnp.eye(4), se3.inverse(T_init), jnp.zeros(2), jnp.zeros(2),
            geo_dims, (0, 300), lr_pose=5e-3,
        )
        T_gn, _, infos = gn_track_frame(
            bundle, kf_pyr, trg_pyr, src_kf.K, kp_ld, kp_base,
            jnp.eye(4), se3.inverse(T_init), jnp.zeros(2), jnp.zeros(2),
            geo_dims, levels=[1], max_iters=25,
        )
        # both estimate T_frame = inv(R); truth: inv(T_true)
        gt_frame = se3.inverse(T_true)
        err_adam = pose_err(T_adam, gt_frame)
        err_gn = pose_err(T_gn, gt_frame)
        total_gn_iters = sum(int(i.num_iters) for i in infos)
        assert err_gn <= err_adam * 1.1, (err_gn, err_adam)
        assert total_gn_iters <= 25, total_gn_iters

    def test_robust_modes_run(self):
        src_kf, trg_kf, bundle, src, kp_ld, kp_base, T_true, geo_dims = setup_problem(48, 64)
        for robust in ("l1", "huber", "none"):
            res = gn_track(
                bundle, src, trg_kf.image, src_kf.K, kp_ld, kp_base,
                T_true, jnp.zeros(2), jnp.zeros(2), geo_dims,
                max_iters=5, robust=robust,
            )
            assert np.isfinite(float(res.final_cost))

    def test_affine_estimation(self):
        """Brightness-shifted target: affine params absorb it."""
        src_kf, trg_kf, bundle, src, kp_ld, kp_base, T_true, geo_dims = setup_problem()
        trg_shifted = jnp.clip(trg_kf.image * 0.8 + 0.1, 0, 1)
        res_no_affine = gn_track(
            bundle, src, trg_shifted, src_kf.K, kp_ld, kp_base,
            T_true, jnp.zeros(2), jnp.zeros(2), geo_dims, max_iters=15,
        )
        res_affine = gn_track(
            bundle, src, trg_shifted, src_kf.K, kp_ld, kp_base,
            T_true, jnp.zeros(2), jnp.zeros(2), geo_dims, max_iters=15,
            use_affine=True,
        )
        assert float(res_affine.final_cost) < float(res_no_affine.final_cost)
