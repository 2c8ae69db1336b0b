"""Tests: scatter render, connected components, discontinuity split,
trajectory alignment/ATE."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from super_primitive_tpu.eval.trajectory import ate_rmse, horn_align, transfer_scale
from super_primitive_tpu.frontend.post_process import (
    depth_discontinuity,
    split_disconnected_segments,
)
from super_primitive_tpu.geometry import projection
from super_primitive_tpu.lie import se3
from super_primitive_tpu.ops.connected_components import label_components
from super_primitive_tpu.ops.scatter import render_depth


class TestScatter:
    def test_roundtrip_render(self):
        H, W = 24, 32
        K = jnp.asarray([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1.0]])
        r, c = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        # offset +0.3 keeps truncation (reference .long() semantics) away
        # from the float round-trip boundary
        uv = jnp.asarray(
            np.stack([c.ravel() + 0.3, r.ravel() + 0.3], -1).astype(np.float32)
        )
        z = jnp.asarray(np.random.default_rng(0).uniform(1, 3, H * W).astype(np.float32))
        pts = projection.unproject(uv, z, K)
        depth, ok = render_depth(pts, K, (H, W))
        np.testing.assert_allclose(np.asarray(depth).ravel(), np.asarray(z), rtol=1e-5)
        assert np.asarray(ok).all()

    def test_min_wins_on_collision(self):
        K = jnp.eye(3)
        pts = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 1.5]])
        depth, _ = render_depth(pts, K, (4, 4))
        np.testing.assert_allclose(float(depth[0, 0]), 1.5)

    def test_invalid_z_dropped(self):
        K = jnp.eye(3)
        pts = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1e-9]])
        depth, ok = render_depth(pts, K, (4, 4))
        assert float(jnp.abs(depth).max()) == 0.0
        assert not np.asarray(ok).any()


class TestConnectedComponents:
    def test_matches_scipy(self):
        r = np.random.default_rng(3)
        masks = r.uniform(size=(4, 20, 26)) > 0.55
        ours = np.asarray(label_components(jnp.asarray(masks)))
        for i in range(4):
            ref, n_ref = ndimage.label(masks[i])
            # same partition: bijection between label sets
            ours_i = ours[i]
            assert (ours_i >= 0).sum() == (ref > 0).sum()
            n_ours = len(np.unique(ours_i[ours_i >= 0]))
            assert n_ours == n_ref
            # every reference component maps to exactly one of ours
            for lab in range(1, n_ref + 1):
                vals = np.unique(ours_i[ref == lab])
                assert len(vals) == 1

    def test_native_matches_device_exactly(self):
        from super_primitive_tpu.ops.connected_components import (
            label_components_native,
        )

        r = np.random.default_rng(7)
        masks = r.uniform(size=(6, 24, 30)) > 0.5
        native = label_components_native(masks)
        if native is None:
            import pytest

            pytest.skip("native lib unavailable")
        dev = np.asarray(label_components(jnp.asarray(masks)))
        # both label with the component-minimum linear index -> bit equal
        np.testing.assert_array_equal(native, dev)

    def test_spiral_long_path(self):
        # long geodesic path exercises pointer jumping
        m = np.zeros((1, 16, 16), bool)
        m[0, 0, :] = True
        m[0, :, -1] = True
        m[0, -1, :] = True
        m[0, 2:, 0] = True
        m[0, 2, : 14] = True
        ours = np.asarray(label_components(jnp.asarray(m)))[0]
        assert len(np.unique(ours[ours >= 0])) == 1


class TestDiscontinuitySplit:
    def _case(self):
        H, W = 24, 32
        regions = np.zeros((1, H, W), bool)
        regions[0, 4:20, 4:28] = True
        logdepth = np.zeros((1, H, W), np.float32)
        logdepth[0, :, 16:] = np.log(3.0)  # depth step at col 16
        logdepth *= regions
        kp = np.asarray([[10, 8]], np.int64)
        return regions, logdepth, kp

    def test_discontinuity_detected(self):
        regions, logdepth, _ = self._case()
        d = np.asarray(
            depth_discontinuity(jnp.asarray(logdepth), jnp.asarray(regions), 3, 0.1)
        )
        assert d[0, 10, 16] or d[0, 10, 15] or d[0, 10, 17]
        assert not d[0, 10, 8]

    def test_native_disc_matches_jax(self):
        from super_primitive_tpu.frontend.post_process import (
            depth_discontinuity_native,
        )

        r = np.random.default_rng(11)
        ld = r.normal(0, 0.5, size=(5, 40, 48)).astype(np.float32)
        va = r.uniform(size=(5, 40, 48)) > 0.4
        for k, thr in ((3, 0.1), (5, 0.25)):
            nat = depth_discontinuity_native(ld, va, k, thr)
            if nat is None:
                import pytest

                pytest.skip("native lib unavailable")
            ref = np.asarray(
                depth_discontinuity(jnp.asarray(ld), jnp.asarray(va), k, thr)
            )
            np.testing.assert_array_equal(nat, ref)

    def test_split_into_parts(self):
        regions, logdepth, kp = self._case()
        new_r, new_ld, new_kp = split_disconnected_segments(regions, logdepth, kp)
        assert new_r.shape[0] == 2  # split across the step
        for j in range(2):
            r, c = new_kp[j]
            assert new_r[j, r, c]
        # frozen logdepth inherited
        assert new_ld.shape == new_r.shape

    def test_split_inherently_disconnected_no_disc(self):
        """A segment made of two separated blobs with NO depth discontinuity
        must still split — kf_fix_disconnected_regions labels every segment
        (post_processer.py:160-181), not just disc carriers.  Regression
        guard: a disc-subset shortcut silently merged these (round 5)."""
        H, W = 240, 320
        regions = np.zeros((1, H, W), bool)
        regions[0, 10:60, 10:60] = True
        regions[0, 100:160, 100:160] = True
        logdepth = np.zeros((1, H, W), np.float32)
        kp = np.asarray([[30, 30]], np.int64)
        new_r, _, new_kp = split_disconnected_segments(
            regions, logdepth, kp, rng=np.random.default_rng(0)
        )
        assert new_r.shape[0] == 2
        for j in range(2):
            r, c = new_kp[j]
            assert new_r[j, r, c]

    def test_no_split_smooth(self):
        H, W = 16, 20
        regions = np.zeros((1, H, W), bool)
        regions[0, 2:14, 2:18] = True
        logdepth = np.full((1, H, W), 0.3, np.float32) * regions
        kp = np.asarray([[8, 10]], np.int64)
        new_r, _, new_kp = split_disconnected_segments(regions, logdepth, kp)
        assert new_r.shape[0] == 1
        np.testing.assert_array_equal(new_r[0], regions[0])
        np.testing.assert_array_equal(new_kp[0], kp[0])


class TestTrajectory:
    def _make_trajs(self, scale=2.0, noise=0.0, n=20):
        r = np.random.default_rng(5)
        gt, est = {}, {}
        T_align = np.asarray(se3.exp(jnp.asarray([0.3, -0.2, 0.5, 1.0, -2.0, 0.5])))
        for k in range(n):
            T = np.asarray(se3.exp(jnp.asarray(
                np.asarray([0.02, 0.01, -0.015, 0.1, 0.05, -0.03], np.float32) * k)))
            gt[str(k)] = T
            T2 = T_align @ T
            T2[:3, 3] = scale * T2[:3, 3] + noise * r.normal(size=3)
            est[str(k)] = T2
        return gt, est

    def test_ate_zero_for_sim3_related(self):
        gt, est = self._make_trajs(scale=2.0, noise=0.0)
        m = ate_rmse(gt, est, align_scale=True)
        assert m["rmse"] < 1e-6
        np.testing.assert_allclose(m["scale"], 0.5, atol=1e-6)

    def test_ate_reflects_noise(self):
        gt, est = self._make_trajs(scale=1.0, noise=0.01)
        m = ate_rmse(gt, est)
        assert 0.001 < m["rmse"] < 0.05

    def test_transfer_scale_display(self):
        gt, est = self._make_trajs(scale=3.0)
        gt_list = [gt[str(k)] for k in range(20)]
        est_list = [est[str(k)] for k in range(20)]
        aligned, info = transfer_scale(gt_list, est_list)
        for T_a, T_gt in zip(aligned, gt_list):
            np.testing.assert_allclose(T_a[:3, 3], T_gt[:3, 3], atol=1e-6)

    def test_horn_identity(self):
        pts = np.random.default_rng(0).normal(size=(3, 15))
        res = horn_align(pts, pts)
        np.testing.assert_allclose(res["rot"], np.eye(3), atol=1e-8)
        np.testing.assert_allclose(res["s"], 1.0, atol=1e-8)
        assert res["trans_error"].max() < 1e-8


class TestChunkedCC:
    def test_chunked_matches_single(self):
        from super_primitive_tpu.ops.connected_components import (
            label_components_chunked,
        )

        r = np.random.default_rng(7)
        masks = r.uniform(size=(10, 20, 26)) > 0.5
        full = np.asarray(label_components(jnp.asarray(masks)))
        chunked = label_components_chunked(masks, chunk=3)
        np.testing.assert_array_equal(full, chunked)

    def test_host_fallback_matches_device(self):
        """The scipy fallback (used when the axon worker faults on large CC
        batches) must produce identical labels."""
        from super_primitive_tpu.ops.connected_components import (
            _label_components_host,
        )

        r = np.random.default_rng(11)
        masks = r.uniform(size=(6, 24, 30)) > 0.45
        device = np.asarray(label_components(jnp.asarray(masks)))
        host = _label_components_host(masks)
        np.testing.assert_array_equal(device, host)
