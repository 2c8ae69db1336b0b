"""Mapping solver tests: Adam mapper and GN/Schur mapper on a synthetic
3-keyframe window with known geometry."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_primitive_tpu.frontend.stub import GridSegmentFrontend
from super_primitive_tpu.keyframe import build_bundle_np
from super_primitive_tpu.lie import se3
from super_primitive_tpu.odometry import mapper, window
from super_primitive_tpu.solve.gn_mapping import (
    adjoint,
    gn_mapping,
    linearize_warp,
    residual_warp,
)

from test_odometry import PlaneSequence, pose_err


@pytest.fixture(scope="module")
def window_setup():
    """3 keyframes from the plane sequence with GT geometry; poses and
    logdepths perturbed (except the gauge-frozen first KF)."""
    ds = PlaneSequence(n_frames=9, H=48, W=64)
    fe = GridSegmentFrontend(rows=3, cols=4)
    kf_ids = [0, 3, 6]
    W_cap, S = 3, 2
    r = np.random.default_rng(0)

    buf = None
    gt_poses = []
    for slot, fid in enumerate(kf_ids):
        frame = ds[fid]
        fe.observe(frame)
        kf = fe.process_to_kf(frame["image"], frame["intrinsics"])
        N_i = kf["regions"].shape[0]
        if buf is None:
            buf = window.empty_window(W_cap, S, kf["image"].shape[:2], 3, 16, 4096)
        bundle = build_bundle_np(kf["regions"], kf["logdepth_perseg"], capacity=4096)
        kp_base = kf["logdepth_perseg"][
            np.arange(N_i), kf["keypoints_rc"][:, 0], kf["keypoints_rc"][:, 1]
        ]
        pose = np.asarray(frame["T"], np.float32)
        gt_poses.append(pose)
        kp_ld = kp_base.copy()
        if slot > 0:  # perturb all but the gauge KF
            pose = np.asarray(
                se3.retract(jnp.asarray(pose),
                            jnp.asarray(0.01 * r.normal(size=6).astype(np.float32)))
            )
            kp_ld = kp_base + r.normal(0, 0.02, N_i).astype(np.float32)
        buf = window.set_keyframe_slot(
            buf, slot, kf["image"], kf["K"], pose, kp_ld, np.zeros(2, np.float32),
            np.asarray(bundle.uv), np.asarray(bundle.seg_id),
            np.asarray(bundle.base_logdepth), np.asarray(bundle.valid),
            int(bundle.num_valid), kp_base,
        )
        # one supporting frame per KF: the next dataset frame at GT pose
        supp = ds[fid + 1]
        supp_img = np.asarray(supp["image"], np.float32) / 255.0
        buf = window.set_supporting_slot(
            buf, slot, 0, supp_img, np.asarray(supp["T"], np.float32),
            np.zeros(2, np.float32),
        )
    geo_dims = (48, 64)
    return buf, gt_poses, geo_dims


def run_adam(buf, geo_dims, iters, num_kfs=3):
    supp_valid = np.asarray(buf.supp_valid)
    slots = mapper.build_slots(num_kfs, buf.capacity, supp_valid, "map")
    masks = mapper.build_masks(
        num_kfs, buf.capacity, supp_valid, "map", buf.capacity, False, False
    )
    return mapper.run_mapping(
        buf,
        jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
        jnp.asarray(slots.src_valid),
        jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
        jnp.asarray(masks.affine_mask),
        jnp.asarray(1e-4), jnp.asarray(1e-2), jnp.asarray(1e-5),
        jnp.asarray(iters), jnp.asarray(False), False,
        geo_dims,
    ), slots, masks


class TestSlotTrim:
    """build_slots trims trailing all-invalid slot columns (the solvers
    gather P rows per (source, slot) regardless of validity, so padding
    columns are pure wasted gather rows) with even-count bucketing so the
    jitted solvers see a bounded set of shapes."""

    def test_chain_only_trims_to_two(self):
        supp_valid = np.zeros((5, 2), bool)
        s = mapper.build_slots(5, 5, supp_valid, "map")
        assert s.trg_index.shape == (5, 2)
        # chain connectivity intact: middle sources keep both neighbors
        assert s.trg_valid[2].tolist() == [True, True]
        assert s.trg_index[2].tolist() == [1, 3]
        assert s.trg_valid[0].tolist() == [True, False]

    def test_bucketing_is_even(self):
        supp_valid = np.zeros((5, 2), bool)
        supp_valid[1, 0] = True  # src 1 and 2 gain one supp target -> 3 used
        s = mapper.build_slots(5, 5, supp_valid, "map")
        assert s.trg_index.shape[1] == 4  # 3 rounded up to even
        supp_valid[:] = True
        s = mapper.build_slots(5, 5, supp_valid, "map")
        assert s.trg_index.shape[1] == 6  # full 2 + 2*S grid

    def test_supp_mode_and_empty(self):
        supp_valid = np.zeros((3, 2), bool)
        s = mapper.build_slots(3, 5, supp_valid, "supp")
        assert s.trg_index.shape[1] == 2  # last KF's single chain target
        assert s.src_valid.tolist() == [False, False, True, False, False]
        s = mapper.build_slots(1, 5, supp_valid, "map")
        assert s.trg_index.shape[1] == 1 and not s.trg_valid.any()


class TestAdamMapping:
    def test_cost_decreases_and_poses_improve(self, window_setup):
        buf, gt_poses, geo_dims = window_setup
        res, slots, masks = run_adam(buf, geo_dims, 150)
        losses = np.asarray(res.losses)
        n = int(res.num_iters)
        assert losses[n - 1] < losses[0] * 0.9
        # perturbed poses move toward GT
        for i in (1, 2):
            e0 = pose_err(jnp.asarray(np.asarray(buf.poses[i])), jnp.asarray(gt_poses[i]))
            e1 = pose_err(res.params.poses[i], jnp.asarray(gt_poses[i]))
            assert e1 < e0, (i, e0, e1)
        # gauge KF untouched
        np.testing.assert_allclose(
            np.asarray(res.params.poses[0]), np.asarray(buf.poses[0]), atol=1e-6
        )

    def test_supp_mode_only_last_logdepth(self, window_setup):
        buf, _, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "supp")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "supp", buf.capacity, True, False
        )
        res = mapper.run_mapping(
            buf,
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
            jnp.asarray(1e-4), jnp.asarray(1e-2), jnp.asarray(1e-5),
            jnp.asarray(20), jnp.asarray(False), False, geo_dims,
        )
        np.testing.assert_allclose(
            np.asarray(res.params.poses), np.asarray(
                jnp.concatenate([buf.poses, buf.supp_poses.reshape(-1, 4, 4)])
            ), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(res.params.kp_logdepth[:2]),
            np.asarray(buf.kp_logdepth[:2]), atol=1e-7,
        )
        assert not np.allclose(
            np.asarray(res.params.kp_logdepth[2]), np.asarray(buf.kp_logdepth[2])
        )


class TestAdjoint:
    def test_adjoint_property(self):
        # exp(Ad(T) xi) = T exp(xi) T^-1
        T = se3.exp(jnp.asarray([0.3, -0.2, 0.1, 0.5, -0.4, 0.2]))
        xi = jnp.asarray([0.05, 0.02, -0.03, 0.1, -0.05, 0.07])
        lhs = se3.exp(adjoint(T) @ xi)
        rhs = T @ se3.exp(xi) @ se3.inverse(T)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


class TestAnalyticJacobian:
    """The closed-form warp Jacobian must equal forward-mode AD of the
    primal residual, column for column (pose 6, logdepth 1, affine 4)."""

    @pytest.mark.parametrize("use_affine", [False, True])
    def test_matches_jacfwd(self, use_affine):
        import jax

        r = np.random.default_rng(3)
        P, H, W = 257, 24, 32
        geo_dims = (H, W)
        K = jnp.asarray(
            [[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1.0]], jnp.float32
        )
        X = jnp.asarray(
            np.stack(
                [
                    r.uniform(-0.4, 0.4, P),
                    r.uniform(-0.3, 0.3, P),
                    r.uniform(0.5, 2.0, P),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        # include a near-zero-depth point to exercise the projection guard
        X = X.at[0, 2].set(1e-8)
        src_px = jnp.asarray(r.uniform(0, 1, (P, 3)).astype(np.float32))
        vstat = jnp.asarray(r.uniform(size=P) > 0.1)
        rel = jnp.asarray(
            np.asarray(
                se3.exp(jnp.asarray(0.05 * r.normal(size=6).astype(np.float32)))
            )
        )
        img = jnp.asarray(r.uniform(0, 1, (H, W, 3)).astype(np.float32))
        aff_s = jnp.asarray([0.05, -0.02], jnp.float32)
        aff_t = jnp.asarray([-0.03, 0.04], jnp.float32)

        r0, valid, J = linearize_warp(
            X, src_px, vstat, rel, K, img, geo_dims, aff_s, aff_t, use_affine
        )
        r0_ref, _ = residual_warp(
            X, src_px, vstat, rel, K, img, geo_dims, aff_s, aff_t, use_affine,
            jnp.zeros(11),
        )
        J_ref = jax.jacfwd(
            lambda loc: residual_warp(
                X, src_px, vstat, rel, K, img, geo_dims, aff_s, aff_t,
                use_affine, loc,
            )[0]
        )(jnp.zeros(11))
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r0_ref), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(J), np.asarray(J_ref), atol=2e-4, rtol=1e-4
        )

    @pytest.mark.parametrize("img_hw", [(24, 32), (6, 8)])
    def test_pooled_taps_match_direct_at_any_image_dims(self, img_hw):
        """The pooled-tap path (cell index + pooled gather + taps_hw) must
        equal direct image sampling, INCLUDING when the image is smaller
        than the geo grid (coarse pyramid levels under geo_down semantics).
        Regression: the cell grid was computed on geo_dims, sending every
        index out of the image-shaped pool, which jnp.take fills with NaN."""
        from super_primitive_tpu.ops.sampling import (
            bilinear_cell_index, pack_bilinear_taps,
        )

        r = np.random.default_rng(5)
        P, Hg, Wg = 257, 24, 32
        Hi, Wi = img_hw
        geo_dims = (Hg, Wg)
        K = jnp.asarray(
            [[1.1 * Wg, 0, Wg / 2], [0, 1.1 * Wg, Hg / 2], [0, 0, 1.0]],
            jnp.float32,
        )
        X = jnp.asarray(np.stack([
            r.uniform(-0.4, 0.4, P), r.uniform(-0.3, 0.3, P),
            r.uniform(0.5, 2.0, P),
        ], axis=-1).astype(np.float32))
        src_px = jnp.asarray(r.uniform(0, 1, (P, 3)).astype(np.float32))
        vstat = jnp.asarray(r.uniform(size=P) > 0.1)
        rel = jnp.asarray(np.asarray(
            se3.exp(jnp.asarray(0.05 * r.normal(size=6).astype(np.float32)))
        ))
        img = jnp.asarray(r.uniform(0, 1, (Hi, Wi, 3)).astype(np.float32))
        a0 = jnp.zeros(2)

        r0_ref, valid_ref, J_ref = linearize_warp(
            X, src_px, vstat, rel, K, img, geo_dims, a0, a0, False
        )

        from super_primitive_tpu.cost import photometric as ph
        from super_primitive_tpu.geometry import projection

        p = projection.transform(X, rel)
        coords = ph.normalized_image_coords(projection.project(p, K), geo_dims)
        idx, wx, wy, okb = bilinear_cell_index(coords, (Hi, Wi))
        pool = pack_bilinear_taps(img).reshape(Hi * Wi, -1)
        taps = jnp.take(pool, idx, axis=0)
        r0, valid, J = linearize_warp(
            X, src_px, vstat, rel, K, None, geo_dims, a0, a0, False,
            taps=(taps, wx, wy, okb), taps_hw=(Hi, Wi),
        )
        assert np.isfinite(np.asarray(r0)).all()
        assert np.isfinite(np.asarray(J)).all()
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r0_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-5)


class TestGNMapping:
    def test_beats_adam_in_few_iters(self, window_setup):
        buf, gt_poses, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        res = gn_mapping(
            buf,
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
            geo_dims, max_iters=25,
        )
        assert float(res.final_cost) < float(res.initial_cost) * 0.7
        assert int(res.num_iters) <= 25
        for i in (1, 2):
            e0 = pose_err(jnp.asarray(np.asarray(buf.poses[i])), jnp.asarray(gt_poses[i]))
            e1 = pose_err(res.poses[i], jnp.asarray(gt_poses[i]))
            assert e1 < e0, (i, e0, e1)
        # gauge fixed
        np.testing.assert_allclose(
            np.asarray(res.poses[0]), np.asarray(buf.poses[0]), atol=1e-6
        )
        # matches/beats Adam-150's cost
        adam_res, _, _ = run_adam(buf, geo_dims, 150)
        adam_losses = np.asarray(adam_res.losses)
        adam_final = adam_losses[int(adam_res.num_iters) - 1]
        assert float(res.final_cost) <= adam_final * 1.2


class TestGNMappingAccuracyVsAdam:
    def test_pose_error_within_10pct_of_adam500(self, window_setup):
        """Mapping-only equivalence at the reference's iteration budget:
        fixed tracks, map with each solver; GN-30's recovered poses must be
        within 10% of Adam-500's error vs GT (VERDICT r2 #3).  Measured:
        GN reaches 0.31-0.41x Adam-500's pose error on this window."""
        buf, gt_poses, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        res_gn = gn_mapping(
            buf,
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
            geo_dims, max_iters=30,
        )
        res_adam, _, _ = run_adam(buf, geo_dims, 500)
        for i in (1, 2):
            e_gn = pose_err(res_gn.poses[i], jnp.asarray(gt_poses[i]))
            e_adam = pose_err(res_adam.params.poses[i], jnp.asarray(gt_poses[i]))
            assert e_gn <= 1.1 * e_adam, (i, e_gn, e_adam)


class TestGNMappingPointStride:
    @pytest.mark.parametrize("stride", [2, 4])
    def test_strided_linearization_keeps_accuracy(self, window_setup, stride):
        """gn_point_stride k linearizes on every k-th bundle point (gather
        rows / k — the latency wall of the solve).  Each ~250-point segment
        keeps >=60 constraints, so the recovered poses must stay in the same
        error band as the exact objective.  Measured on this window: stride
        1/2/4/8 all land within [0.7x, 2.2x] of stride-1's per-pose error
        (noise-level reshuffling around the convergence floor)."""
        buf, gt_poses, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        args = (
            buf,
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
            geo_dims,
        )
        res1 = gn_mapping(*args, max_iters=30)
        resk = gn_mapping(*args, max_iters=30, point_stride=stride)
        for i in (1, 2):
            e1 = pose_err(res1.poses[i], jnp.asarray(gt_poses[i]))
            ek = pose_err(resk.poses[i], jnp.asarray(gt_poses[i]))
            assert ek <= max(2.5 * e1, 5e-3), (i, stride, ek, e1)


class TestSuppRefinementGN:
    def test_reduces_cost_and_matches_adam_quality(self, window_setup):
        buf, _, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "supp")
        i = 2
        ld_gn, costs = mapper.run_supp_refinement_gn(
            buf, jnp.asarray(i),
            jnp.asarray(slots.trg_index[i]), jnp.asarray(slots.trg_valid[i]),
            False, geo_dims,
        )
        assert float(costs[1]) < float(costs[0])
        # Adam-10 path for comparison
        ld_adam, losses = mapper.run_supp_refinement(
            buf, jnp.asarray(i),
            jnp.asarray(slots.trg_index[i]), jnp.asarray(slots.trg_valid[i]),
            jnp.asarray(1e-2), jnp.asarray(10), False, geo_dims,
        )
        adam_final = float(np.asarray(losses)[9])
        assert float(costs[1]) <= adam_final * 1.1, (float(costs[1]), adam_final)


class TestFactoredAssemble:
    """The factored normal-equation path (J7 = -dIs @ F, no (P, 3, 10)
    Jacobian materialization) equals the direct J path element-wise."""

    @pytest.mark.parametrize("use_affine", [True, False])
    def test_matches_direct(self, window_setup, use_affine):
        from super_primitive_tpu.solve.gn_mapping import assemble, build_cmap

        buf, gt_poses, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity,
            use_affine, use_affine,
        )
        par_mask = jnp.concatenate([
            jnp.repeat(jnp.asarray(masks.xi_mask), 6),
            jnp.repeat(jnp.asarray(masks.affine_mask), 2),
        ])
        trg_index = jnp.asarray(slots.trg_index)
        trg_images = buf.image_pool()[trg_index]
        src_samples = buf.source_samples(geo_dims)
        args = (
            buf, trg_index, jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid), trg_images, src_samples,
            par_mask, geo_dims, use_affine,
            buf.pose_pool(), buf.kp_logdepth, buf.affine_pool(),
        )
        H_d, g_d, D_d, gl_d, Bs_d, cost_d = assemble(*args, factored=False)
        H_f, g_f, D_f, gl_f, Bs_f, cost_f = assemble(*args, factored=True)
        np.testing.assert_allclose(np.asarray(cost_f), np.asarray(cost_d),
                                   rtol=1e-6)
        sc = max(np.abs(np.asarray(H_d)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_d),
                                   atol=2e-5 * sc)
        gsc = max(np.abs(np.asarray(g_d)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_d),
                                   atol=2e-5 * gsc)
        np.testing.assert_allclose(np.asarray(D_f), np.asarray(D_d),
                                   atol=2e-5 * max(np.abs(np.asarray(D_d)).max(), 1e-6))
        np.testing.assert_allclose(np.asarray(gl_f), np.asarray(gl_d),
                                   atol=2e-5 * max(np.abs(np.asarray(gl_d)).max(), 1e-6))
        np.testing.assert_allclose(np.asarray(Bs_f), np.asarray(Bs_d),
                                   atol=2e-5 * max(np.abs(np.asarray(Bs_d)).max(), 1e-6))

    def test_gn_solve_equal_converged_cost(self, window_setup):
        buf, gt_poses, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        sargs = (
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
        )
        res_d = gn_mapping(buf, *sargs, geo_dims, max_iters=15, factored=False)
        res_f = gn_mapping(buf, *sargs, geo_dims, max_iters=15, factored=True)
        np.testing.assert_allclose(
            float(res_f.final_cost), float(res_d.final_cost), rtol=1e-3
        )
        for i in (1, 2):
            ed = pose_err(res_d.poses[i], jnp.asarray(gt_poses[i]))
            ef = pose_err(res_f.poses[i], jnp.asarray(gt_poses[i]))
            assert ef < ed * 1.15 + 1e-5, (i, ed, ef)


class TestGNScaleGaugePin:
    """Mono-init scale-gauge retraction (gn_mapping pin_scale_gauge).

    The 2-KF mono-init problem has an exact photometric null direction:
    kp_logdepth += c on every active landmark with every world-from-camera
    translation scaled by e^c (depths and camera centers co-scale,
    projections are invariant).  The pin retracts each LM step back to
    mean(ld) = const along that direction (PARITY.md fragility note)."""

    @staticmethod
    def _rebase_to_identity(buf):
        """Left-multiply every pose by T0^-1 so the first KF sits at the
        identity (cost depends only on relative poses)."""
        T0_inv = jnp.asarray(np.linalg.inv(np.asarray(buf.poses[0])))
        return buf.replace(
            poses=jnp.einsum("ij,wjk->wik", T0_inv, buf.poses),
            supp_poses=jnp.einsum("ij,wsjk->wsik", T0_inv, buf.supp_poses),
        )

    def test_null_direction_is_cost_neutral(self, window_setup):
        from super_primitive_tpu.solve.gn_mapping import assemble

        buf, _, geo_dims = window_setup
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        par_mask = jnp.concatenate([
            jnp.repeat(jnp.asarray(masks.xi_mask), 6),
            jnp.repeat(jnp.asarray(masks.affine_mask), 2),
        ])
        trg_index = jnp.asarray(slots.trg_index)

        def cost_at(b):
            out = assemble(
                b, trg_index, jnp.asarray(slots.trg_valid),
                jnp.asarray(slots.src_valid), b.image_pool()[trg_index],
                b.source_samples(geo_dims), par_mask, geo_dims, False,
                b.pose_pool(), b.kp_logdepth, b.affine_pool(),
            )
            return float(out[5])

        c = 0.1
        scaled = window_setup[0].replace(
            kp_logdepth=buf.kp_logdepth + c,
            poses=buf.poses.at[:, :3, 3].multiply(np.exp(c)),
            supp_poses=buf.supp_poses.at[:, :, :3, 3].multiply(np.exp(c)),
        )
        c0, c1 = cost_at(buf), cost_at(scaled)
        np.testing.assert_allclose(c1, c0, rtol=2e-4)

    def test_pinned_init_solve_pins_mean_and_keeps_quality(self, window_setup):
        buf, _, geo_dims = window_setup
        buf = self._rebase_to_identity(buf)
        # init-style configuration: 2 KFs, window not full -> both logdepth
        # rows free, only pose 1 free (the mono-init near-null setup)
        supp_valid = np.zeros_like(np.asarray(buf.supp_valid))
        slots = mapper.build_slots(2, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            2, buf.capacity, supp_valid, "map", buf.capacity, False, False
        )
        sargs = (
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
        )
        res_u = gn_mapping(buf, *sargs, geo_dims, max_iters=20)
        res_p = gn_mapping(
            buf, *sargs, geo_dims, max_iters=20, pin_scale_gauge=True
        )
        # quality preserved: the pin moves along a cost-neutral direction
        assert float(res_p.final_cost) < float(res_p.initial_cost)
        assert float(res_p.final_cost) <= float(res_u.final_cost) * 1.05 + 1e-8
        # gauge pinned: mean logdepth over active landmarks is unchanged
        n_active = 12  # 3x4 GridSegmentFrontend segments, all visible
        ld0 = np.asarray(buf.kp_logdepth)[:2, :n_active]
        ldp = np.asarray(res_p.kp_logdepth)[:2, :n_active]
        assert abs(float(np.mean(ldp - ld0))) < 5e-4
        # frozen first pose untouched (zero translation scales to zero)
        np.testing.assert_allclose(
            np.asarray(res_p.poses[0]), np.asarray(buf.poses[0]), atol=1e-6
        )
