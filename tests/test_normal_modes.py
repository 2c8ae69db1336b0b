"""Channel-mode tests (cost/normal_modes.py) incl. include_normals frontend."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.cost import photometric as ph
from super_primitive_tpu.cost.normal_modes import split_by_mode, transform_normals
from super_primitive_tpu.keyframe import build_bundle_np, make_segment_geometry
from super_primitive_tpu.lie import se3


class TestSplit:
    def test_modes(self):
        x = jnp.arange(7.0)[None, :] * jnp.ones((5, 1))
        a, c, k = split_by_mode(x, "colour")
        assert a.shape == (5, 3) and c is None and k is None
        a, c, k = split_by_mode(x, "colour_norm")
        assert a.shape == (5, 3) and c.shape == (5, 3) and k is None
        a, c, k = split_by_mode(x, "colour_norm_kappa")
        assert k.shape == (5, 1)
        a, c, k = split_by_mode(x[:, :4], "norm_kappa")
        assert a is None and c.shape == (5, 3) and k.shape == (5, 1)


class TestTransform:
    def test_rotation_applied(self):
        pose = se3.exp(jnp.asarray([0.3, -0.2, 0.4, 1.0, 0.0, 0.0]))
        pix = jnp.concatenate(
            [jnp.ones((10, 3)) * 0.5, jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (10, 1))],
            axis=-1,
        )
        out = transform_normals(pix, pose, "colour_norm")
        np.testing.assert_allclose(np.asarray(out[:, :3]), 0.5)
        expected = np.asarray(pose)[:3, :3] @ np.asarray([0, 0, 1.0])
        np.testing.assert_allclose(np.asarray(out[0, 3:]), expected, atol=1e-6)

    def test_colour_identity(self):
        pix = jnp.ones((4, 3))
        out = transform_normals(pix, jnp.eye(4), "colour")
        assert out is pix


class TestCostWithNormals:
    def test_affine_channels_only(self):
        """With 6-channel images, mode='colour_norm' must use only RGB in the
        residual (the cosine term is zero in the reference)."""
        r = np.random.default_rng(0)
        H, W = 24, 32
        K = jnp.asarray([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1.0]])
        regions = np.zeros((2, H, W), bool)
        regions[0, 4:12, 4:16] = True
        regions[1, 12:20, 16:28] = True
        logdepth = (np.full((2, H, W), 0.5, np.float32)) * regions
        kp = np.asarray([[8, 10], [16, 22]], np.int64)
        bundle = build_bundle_np(regions, logdepth, capacity=1024)
        kp_base = logdepth[np.arange(2), kp[:, 0], kp[:, 1]]

        rgb = r.uniform(0, 1, (H, W, 3)).astype(np.float32)
        normals_a = r.normal(size=(H, W, 3)).astype(np.float32)
        normals_b = r.normal(size=(H, W, 3)).astype(np.float32)
        img_a = jnp.asarray(np.concatenate([rgb, normals_a], -1))
        img_b = jnp.asarray(np.concatenate([rgb, normals_b], -1))

        src_a = ph.precompute_source(img_a, bundle, (H, W))
        res_a = ph.photometric_cost(
            bundle, src_a, img_a, K, (H, W), jnp.asarray(kp_base),
            jnp.asarray(kp_base), jnp.eye(4), mode="colour_norm",
        )
        src_b = ph.precompute_source(img_a, bundle, (H, W))
        res_b = ph.photometric_cost(
            bundle, src_b, img_b, K, (H, W), jnp.asarray(kp_base),
            jnp.asarray(kp_base), jnp.eye(4), mode="colour_norm",
        )
        # identical RGB, different normal channels -> identical residual
        np.testing.assert_allclose(float(res_a), float(res_b), atol=1e-7)
        assert float(res_a) < 1e-6  # same image at identity
