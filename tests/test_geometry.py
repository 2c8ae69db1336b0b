"""Projection / unprojection / coords tests, incl. parity with the reference
formulas (core/ops.py, tool/point_utils.py) re-derived independently."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.geometry import coords, projection
from super_primitive_tpu.lie import se3

K = jnp.asarray([[320.0, 0.0, 160.0], [0.0, 320.0, 120.0], [0.0, 0.0, 1.0]])


def rng(seed=0):
    return np.random.default_rng(seed)


class TestProjection:
    def test_project_unproject_inverse(self):
        uv = rng().uniform(0, 300, size=(64, 2)).astype(np.float32)
        z = rng(1).uniform(0.5, 5.0, size=(64,)).astype(np.float32)
        pts = projection.unproject(jnp.asarray(uv), jnp.asarray(z), K)
        uv_back = np.asarray(projection.project(pts, K))
        np.testing.assert_allclose(uv_back, uv, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pts[:, 2]), z)

    def test_project_depth_invariance(self):
        # project(unproject(uv, z)) must not depend on z
        uv = jnp.asarray([[100.0, 50.0]])
        for z in [0.1, 1.0, 10.0]:
            pts = projection.unproject(uv, jnp.asarray([z]), K)
            uv_back = np.asarray(projection.project(pts, K))
            np.testing.assert_allclose(uv_back, np.asarray(uv), atol=1e-3)

    def test_project_eps_guard(self):
        # |z| <= 1e-6 -> z_inv = eps (reference core/ops.py:33-34), stays finite
        pts = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1e-9]])
        uv = np.asarray(projection.project(pts, K))
        assert np.all(np.isfinite(uv))
        # u = x * fx * eps + cx ~= cx
        np.testing.assert_allclose(uv[:, 0], [160.0 + 320e-6] * 2, atol=1e-3)

    def test_transform_matches_matmul(self):
        pts = rng(2).normal(size=(32, 3)).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(rng(3).normal(size=6).astype(np.float32))))
        out = np.asarray(projection.transform(jnp.asarray(pts), jnp.asarray(T)))
        expected = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_transform_batched(self):
        pts = rng(4).normal(size=(64, 3)).astype(np.float32)
        T = np.asarray(se3.exp(jnp.asarray(rng(5).normal(size=(3, 6)).astype(np.float32))))
        out = np.asarray(projection.transform(jnp.asarray(pts), jnp.asarray(T[:, None][:, 0])))
        for b in range(3):
            expected = pts @ T[b, :3, :3].T + T[b, :3, 3]
            np.testing.assert_allclose(out[b], expected, atol=1e-5)

    def test_scale_intrinsics_half(self):
        # reference convention: K' = [[sx,0,sx],[0,sy,sy],[0,0,1]] @ K
        K_half = np.asarray(projection.scale_intrinsics(K, (0.5, 0.5)))
        expected = np.array([[0.5, 0, 0.5], [0, 0.5, 0.5], [0, 0, 1.0]]) @ np.asarray(K)
        np.testing.assert_allclose(K_half, expected, atol=1e-6)


class TestCoords:
    def test_roundtrip(self):
        px = rng(6).integers(0, 240, size=(64, 2)).astype(np.float32)
        dims = (240, 320)
        n = coords.normalize_coords(jnp.asarray(px), jnp.asarray(dims, jnp.float32))
        back = np.asarray(coords.denormalize_coords(n, jnp.asarray(dims, jnp.float32)))
        np.testing.assert_array_equal(back, px.astype(np.int32))

    def test_corners_align(self):
        dims = jnp.asarray([10.0, 20.0])
        n0 = np.asarray(coords.normalize_coords(jnp.asarray([0.0, 0.0]), dims))
        n1 = np.asarray(coords.normalize_coords(jnp.asarray([9.0, 19.0]), dims))
        np.testing.assert_allclose(n0, [-1.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(n1, [1.0, 1.0], atol=1e-6)

    def test_matches_reference_formula(self):
        # norm = 2*px/(dim-1) - 1  (tool/point_utils.py:31-35)
        px = np.asarray([3.0, 7.0], dtype=np.float32)
        dims = np.asarray([11.0, 21.0], dtype=np.float32)
        n = np.asarray(coords.normalize_coords(jnp.asarray(px), jnp.asarray(dims)))
        np.testing.assert_allclose(n, 2 * px / (dims - 1) - 1, atol=1e-6)
