"""BiNI validation: analytic surfaces, dense direct solve, gauge behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_primitive_tpu.integrate.bini import (
    BiniConfig,
    _apply_A,
    _coefficients,
    _edge_masks,
    _system,
    integrate_normals,
    integrate_to_depth,
)


def make_K(H, W, f=60.0):
    return jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], jnp.float32)


def normals_from_depth(depth, K):
    """Analytic-ish normals from a depth map via central differences of the
    3D surface; normalized, camera-facing (nz < 0 for fronto-parallel)."""
    H, W = depth.shape
    K = np.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    S = np.stack([x, y, depth], -1)
    Su = np.gradient(S, axis=1)
    Sv = np.gradient(S, axis=0)
    n = np.cross(Su, Sv)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    # orient toward camera: n . S < 0
    flip = np.sum(n * S, axis=-1) > 0
    n[flip] *= -1
    return n.astype(np.float32)


def rel_logdepth_error(zt_est, depth_true, mask):
    """Compare log-depths up to a per-segment constant (the gauge)."""
    lt = np.log(depth_true)
    m = np.asarray(mask, bool)
    diff = np.asarray(zt_est)[m] - lt[m]
    diff -= diff.mean()
    return np.abs(diff).max()


class TestBini:
    def test_fronto_parallel_plane(self):
        # constant depth -> normals (0,0,-1) -> zt constant (zero after gauge)
        H, W = 24, 32
        K = make_K(H, W)
        depth = np.full((H, W), 2.0, np.float32)
        normals = np.zeros((H, W, 3), np.float32)
        normals[..., 2] = -1.0
        mask = np.zeros((1, H, W), bool)
        mask[0, 4:20, 6:26] = True
        zt = integrate_normals(jnp.asarray(normals), jnp.asarray(mask), K)
        assert float(jnp.abs(zt).max()) < 1e-5

    def test_slanted_plane_recovered(self):
        H, W = 32, 40
        K = make_K(H, W, f=80.0)
        u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        # plane in 3D: z = z0 / (1 - a*(u-cx)/fx - b*(v-cy)/fy)  (planar surface)
        a, b, z0 = 0.25, -0.15, 2.0
        Kn = np.asarray(K)
        denom = 1 - a * (u - Kn[0, 2]) / Kn[0, 0] - b * (v - Kn[1, 2]) / Kn[1, 1]
        depth = (z0 / denom).astype(np.float32)
        normals = normals_from_depth(depth, K)
        mask = np.zeros((1, H, W), bool)
        mask[0, 3:29, 4:36] = True
        cfg = BiniConfig(cg_tol=1e-6, cg_max_iter=3000)
        zt = integrate_normals(jnp.asarray(normals), jnp.asarray(mask), K, cfg)
        err = rel_logdepth_error(zt[0], depth, mask[0])
        assert err < 0.02, err

    def test_smooth_surface_batched(self):
        H, W = 32, 40
        K = make_K(H, W, f=100.0)
        u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        depth = (2.0 + 0.1 * np.sin(u * 0.2) + 0.08 * np.cos(v * 0.25)).astype(np.float32)
        normals = normals_from_depth(depth, K)
        masks = np.zeros((3, H, W), bool)
        masks[0, 2:16, 2:20] = True
        masks[1, 16:30, 20:38] = True
        masks[2, 5:28, 8:32] = True  # overlaps both — independent system
        cfg = BiniConfig(cg_tol=1e-6, cg_max_iter=3000)
        zt = integrate_normals(jnp.asarray(normals), jnp.asarray(masks), K, cfg)
        for i in range(3):
            err = rel_logdepth_error(zt[i], depth, masks[i])
            assert err < 0.05, (i, err)

    def test_matches_dense_direct_solve(self):
        """Matrix-free A against an explicitly assembled dense system."""
        H, W = 10, 12
        K = make_K(H, W, f=30.0)
        r = np.random.default_rng(0)
        normals = r.normal(size=(H, W, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        normals[..., 2] = -np.abs(normals[..., 2]) - 0.3
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        mask = np.zeros((1, H, W), bool)
        mask[0, 2:9, 3:10] = True

        D, c_u, c_v = _coefficients(jnp.asarray(normals), K)
        em_b = _edge_masks(jnp.asarray(mask))
        em = {k: v.astype(jnp.float32) for k, v in em_b.items()}
        w_u = jnp.full((1, H, W), 0.5)
        w_v = jnp.full((1, H, W), 0.5)
        q, b, diag = _system(D, c_u, c_v, em, w_u, w_v)

        # dense assembly of A via unit vectors
        n_pix = H * W
        A = np.zeros((n_pix, n_pix), np.float32)
        for j in range(n_pix):
            e = np.zeros((1, H, W), np.float32)
            e.reshape(-1)[j] = 1.0
            A[:, j] = np.asarray(_apply_A(jnp.asarray(e), D, q)).reshape(-1)
        bd = np.asarray(b).reshape(-1)
        m = np.asarray(mask).reshape(-1)
        idx = np.nonzero(m)[0]
        A_sub = A[np.ix_(idx, idx)].astype(np.float64)
        b_sub = bd[idx].astype(np.float64)
        # solve dense least squares (A singular: constant null space)
        zt_dense = np.linalg.lstsq(A_sub, b_sub, rcond=None)[0]
        zt_dense -= zt_dense.mean()

        cfg = BiniConfig(outer_iters=1, cg_tol=1e-10, cg_max_iter=5000)
        zt = integrate_normals(jnp.asarray(normals), jnp.asarray(mask), K, cfg)
        zt_cg = np.asarray(zt).reshape(-1)[idx]
        np.testing.assert_allclose(zt_cg, zt_dense, atol=5e-4)

        # diag parity
        diag_dense = np.diag(A)
        np.testing.assert_allclose(np.asarray(diag).reshape(-1)[idx], diag_dense[idx], atol=1e-5)

    def test_depth_discontinuity_bilateral(self):
        """A step edge inside one mask: bilateral weights should reduce the
        error vs naive central weighting (the BiNI selling point)."""
        H, W = 24, 40
        K = make_K(H, W, f=200.0)  # long focal: near-orthographic
        depth = np.full((H, W), 2.0, np.float32)
        depth[:, 20:] = 3.0
        normals = np.zeros((H, W, 3), np.float32)
        normals[..., 2] = -1.0  # both planes fronto-parallel
        mask = np.zeros((1, H, W), bool)
        mask[0, 2:22, 2:38] = True
        cfg = BiniConfig(k=5.0, outer_iters=20, cg_tol=1e-8, cg_max_iter=2000)
        zt = np.asarray(integrate_normals(jnp.asarray(normals), jnp.asarray(mask), K, cfg))[0]
        # with fronto-parallel normals everywhere, the integrated field should
        # be piecewise constant; bilateral weighting confines smoothing to the
        # single discontinuity column pair
        left = zt[5:20, 4:18]
        right = zt[5:20, 24:36]
        assert left.std() < 1e-3 and right.std() < 1e-3

    def test_wraparound_isolation(self):
        """Mask touching left and right borders must not couple across."""
        H, W = 8, 12
        K = make_K(H, W)
        normals = np.zeros((H, W, 3), np.float32)
        normals[..., 2] = -1.0
        mask = np.zeros((1, H, W), bool)
        mask[0, 2:6, :] = True  # full-width band
        zt = integrate_normals(jnp.asarray(normals), jnp.asarray(mask), K)
        assert np.all(np.isfinite(np.asarray(zt)))

    def test_integrate_to_depth_gauge(self):
        H, W = 16, 20
        K = make_K(H, W)
        normals = np.zeros((H, W, 3), np.float32)
        normals[..., 2] = -1.0
        mask = np.zeros((2, H, W), bool)
        mask[0, 2:8, 2:10] = True
        mask[1, 9:14, 4:16] = True
        d = np.asarray(integrate_to_depth(jnp.asarray(normals), jnp.asarray(mask), K))
        # fronto-parallel: depth == 1 inside (exp(0)), 0 outside
        for i in range(2):
            np.testing.assert_allclose(d[i][mask[i]], 1.0, atol=1e-4)
            assert np.all(d[i][~mask[i]] == 0)
