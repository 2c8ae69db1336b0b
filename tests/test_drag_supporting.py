"""Regression for opt_supporting=False semantics: supporting poses must move
rigidly with their source keyframe during mapping (odometery.py:873-877),
not stay frozen in the world frame."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.odometry import mapper
from super_primitive_tpu.solve.gn_mapping import gn_mapping

from test_mapping import window_setup  # fixture  # noqa: F401


def relative_pose(a, b):
    return np.linalg.inv(np.asarray(a)) @ np.asarray(b)


class TestDragSupporting:
    def _run(self, buf, geo_dims, drag):
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(3, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            3, buf.capacity, supp_valid, "map", buf.capacity,
            opt_supporting=False, affine_compensation=False,
        )
        return mapper.run_mapping(
            buf,
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
            jnp.asarray(1e-3), jnp.asarray(1e-2), jnp.asarray(1e-5),
            jnp.asarray(30), jnp.asarray(False), False, geo_dims,
            drag_supporting=jnp.asarray(drag),
        )

    def test_supp_follows_kf(self, window_setup):
        buf, _, geo_dims = window_setup
        W = buf.capacity
        S = buf.supp_capacity
        res = self._run(buf, geo_dims, drag=1.0)
        # KF 1 moved
        kf1_before = np.asarray(buf.poses[1])
        kf1_after = np.asarray(res.params.poses[1])
        assert not np.allclose(kf1_before, kf1_after, atol=1e-6)
        # supporting frame of KF 1 moved by exactly the same relative update
        supp_before = np.asarray(buf.supp_poses[1, 0])
        supp_after = np.asarray(res.params.poses[W + 1 * S + 0])
        rel_kf = relative_pose(kf1_before, kf1_after)
        rel_supp = relative_pose(supp_before, supp_after)
        np.testing.assert_allclose(rel_supp, rel_kf, atol=1e-4)

    def test_no_drag_freezes_supp(self, window_setup):
        buf, _, geo_dims = window_setup
        W = buf.capacity
        S = buf.supp_capacity
        res = self._run(buf, geo_dims, drag=0.0)
        supp_before = np.asarray(buf.supp_poses[1, 0])
        supp_after = np.asarray(res.params.poses[W + 1 * S + 0])
        np.testing.assert_allclose(supp_before, supp_after, atol=1e-6)
