"""Solver tests: retraction-Adam semantics + two-frame SfM convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.keyframe import keyframe_pyramid
from super_primitive_tpu.lie import se3
from super_primitive_tpu.solve.retraction_adam import (
    OptParams,
    final_poses,
    make_optimizer,
    run_adam,
)
from super_primitive_tpu.solve.two_frame import TwoFrameConfig, solve_two_frame

from synthetic import plane_keyframes


def pose_error(T_est, T_true):
    return float(jnp.linalg.norm(se3.log(se3.inverse(T_true) @ T_est)))


class TestRetractionAdam:
    def _quadratic_setup(self, fold):
        """Minimize ||log(T)||^2 + ||ld - 1||^2 from a random start."""
        T0 = se3.exp(jnp.asarray([0.2, -0.1, 0.15, 0.3, -0.2, 0.1]))[None]

        def loss_fn(poses, ld, affine):
            return jnp.sum(se3.log(poses) ** 2) + jnp.sum((ld - 1.0) ** 2)

        params = OptParams(
            poses=T0, xi=jnp.zeros((1, 6)), kp_logdepth=jnp.zeros(3),
            affine=jnp.zeros((1, 2)),
        )
        opt = make_optimizer(lr_depth=0.05, lr_pose=0.05)
        state = opt.init(params)
        return loss_fn, params, opt, state

    def test_fold_mode_converges(self):
        loss_fn, params, opt, state = self._quadratic_setup(True)
        res = run_adam(loss_fn, params, opt, state, 400, fold=True)
        T = final_poses(res.params)[0]
        assert pose_error(T, jnp.eye(4)) < 0.02
        np.testing.assert_allclose(np.asarray(res.params.kp_logdepth), 1.0, atol=0.02)
        # fold mode keeps xi at zero
        np.testing.assert_allclose(np.asarray(res.params.xi), 0.0)

    def test_accumulate_mode_converges(self):
        loss_fn, params, opt, state = self._quadratic_setup(False)
        res = run_adam(loss_fn, params, opt, state, 400, fold=False)
        T = final_poses(res.params)[0]
        assert pose_error(T, jnp.eye(4)) < 0.02
        # base pose untouched in accumulate mode
        np.testing.assert_allclose(
            np.asarray(res.params.poses), np.asarray(params.poses)
        )

    def test_pose_update_mask_freezes(self):
        T0 = se3.exp(jnp.asarray([[0.2, -0.1, 0.15, 0.3, -0.2, 0.1],
                                  [0.1, 0.1, -0.1, 0.2, 0.1, -0.2]]))

        def loss_fn(poses, ld, affine):
            return jnp.sum(se3.log(poses) ** 2)

        params = OptParams(
            poses=T0, xi=jnp.zeros((2, 6)), kp_logdepth=jnp.zeros(1),
            affine=jnp.zeros((2, 2)),
        )
        opt = make_optimizer(0.05, 0.05)
        res = run_adam(
            loss_fn, params, opt, opt.init(params), 200, fold=True,
            pose_update_mask=jnp.asarray([0.0, 1.0]),
        )
        # frame 0 frozen, frame 1 moved to identity
        np.testing.assert_allclose(
            np.asarray(res.params.poses[0]), np.asarray(T0[0]), atol=1e-6
        )
        assert pose_error(res.params.poses[1], jnp.eye(4)) < 0.05

    def test_skip_first_step(self):
        loss_fn, params, opt, state = self._quadratic_setup(True)
        res1 = run_adam(loss_fn, params, opt, state, 1, fold=True, skip_first_step=True)
        np.testing.assert_allclose(
            np.asarray(res1.params.poses), np.asarray(params.poses)
        )
        res2 = run_adam(loss_fn, params, opt, state, 1, fold=True, skip_first_step=False)
        assert not np.allclose(np.asarray(res2.params.poses), np.asarray(params.poses))

    def test_matches_torch_adam_trajectory(self):
        """Euclidean-only params: optax path must match torch.optim.Adam."""
        import torch

        def loss_fn(poses, ld, affine):
            return jnp.sum((ld - 2.0) ** 2) + jnp.sum(ld**3) * 0.01

        params = OptParams(
            poses=jnp.eye(4)[None], xi=jnp.zeros((1, 6)),
            kp_logdepth=jnp.asarray([0.5, -0.3, 1.2]), affine=jnp.zeros((1, 2)),
        )
        opt = make_optimizer(lr_depth=1e-2, lr_pose=1e-2)
        res = run_adam(loss_fn, params, opt, opt.init(params), 50, fold=True)

        ld = torch.tensor([0.5, -0.3, 1.2], requires_grad=True)
        topt = torch.optim.Adam([ld], lr=1e-2)
        for _ in range(50):
            loss = ((ld - 2.0) ** 2).sum() + (ld**3).sum() * 0.01
            topt.zero_grad()
            loss.backward()
            topt.step()
        np.testing.assert_allclose(
            np.asarray(res.params.kp_logdepth), ld.detach().numpy(), atol=1e-5
        )


class TestTwoFrameSfM:
    def test_converges_on_plane(self):
        src_kf, trg_kf, bundle, T_true, depth = plane_keyframes(H=48, W=64)
        src_pyr = keyframe_pyramid(src_kf, 0, 3, bundle=bundle)
        trg_pyr = keyframe_pyramid(trg_kf, 0, 3)

        # noised GT pose init + wrong depth (reference init scheme)
        T_init = se3.retract(
            T_true, jnp.asarray([0.02, -0.02, 0.015, -0.03, 0.04, 0.03])
        )[None]
        ld_init = jnp.full((4,), 0.2)  # depth 1.22 vs true 2.0

        cfg = TwoFrameConfig(num_iters=300, lr_depth=3e-3, lr_pose=1e-2)
        poses, ld, losses = solve_two_frame(src_pyr, [trg_pyr], T_init, ld_init, cfg)

        first_loss = float(losses[0][1])  # step 0 of coarsest is skipped
        last_loss = float(losses[-1][-1])
        assert last_loss < 0.25 * first_loss
        assert pose_error(poses[0], T_true) < pose_error(T_init[0], T_true)
        # depth should move toward truth (gauge allows residual scale error)
        assert abs(float(jnp.exp(ld).mean()) - depth) < abs(
            float(jnp.exp(ld_init).mean()) - depth
        )

    def test_loss_history_shape(self):
        src_kf, trg_kf, bundle, T_true, _ = plane_keyframes(H=32, W=48)
        src_pyr = keyframe_pyramid(src_kf, 0, 2, bundle=bundle)
        trg_pyr = keyframe_pyramid(trg_kf, 0, 2)
        cfg = TwoFrameConfig(num_iters=5)
        _, _, losses = solve_two_frame(
            src_pyr, [trg_pyr], T_true[None], jnp.zeros(4), cfg
        )
        assert len(losses) == 2 and all(l.shape == (5,) for l in losses)


class TestTwoFrameGN:
    def test_converges_on_plane(self):
        """The GN/LM path must reach at least Adam-300's quality in tens of
        LM iterations (same init scheme)."""
        from super_primitive_tpu.solve.two_frame import solve_two_frame_gn

        src_kf, trg_kf, bundle, T_true, depth = plane_keyframes(H=48, W=64)
        src_pyr = keyframe_pyramid(src_kf, 0, 3, bundle=bundle)
        trg_pyr = keyframe_pyramid(trg_kf, 0, 3)
        T_init = se3.retract(
            T_true, jnp.asarray([0.02, -0.02, 0.015, -0.03, 0.04, 0.03])
        )[None]
        ld_init = jnp.full((4,), 0.2)

        poses, ld, losses = solve_two_frame_gn(
            src_pyr, [trg_pyr], T_init, ld_init, max_iters=20
        )
        assert losses[-1][1] < 0.25 * losses[0][0]
        err0 = pose_error(T_init[0], T_true)
        err = pose_error(poses[0], T_true)
        assert err < 0.3 * err0, (err, err0)
        assert abs(float(jnp.exp(ld).mean()) - depth) < abs(
            float(jnp.exp(ld_init).mean()) - depth
        )

    def test_matches_adam_quality(self):
        """Final pose from GN is at least as good as the Adam parity path."""
        from super_primitive_tpu.solve.two_frame import solve_two_frame_gn

        src_kf, trg_kf, bundle, T_true, _ = plane_keyframes(H=48, W=64)
        src_pyr = keyframe_pyramid(src_kf, 0, 3, bundle=bundle)
        trg_pyr = keyframe_pyramid(trg_kf, 0, 3)
        T_init = se3.retract(
            T_true, jnp.asarray([0.02, -0.02, 0.015, -0.03, 0.04, 0.03])
        )[None]
        ld_init = jnp.full((4,), 0.2)

        cfg = TwoFrameConfig(num_iters=300, lr_depth=3e-3, lr_pose=1e-2)
        poses_a, _, _ = solve_two_frame(src_pyr, [trg_pyr], T_init, ld_init, cfg)
        poses_g, _, _ = solve_two_frame_gn(
            src_pyr, [trg_pyr], T_init, ld_init, max_iters=20
        )
        assert pose_error(poses_g[0], T_true) <= 1.5 * pose_error(
            poses_a[0], T_true
        )
