"""Crop-based BiNI: exactness vs the full-field solver for fitting segments."""

import jax.numpy as jnp
import numpy as np

from super_primitive_tpu.integrate.bini import (
    BiniConfig,
    integrate_normals,
    integrate_normals_cropped,
    segment_bbox_sizes,
)

from test_bini import make_K, normals_from_depth


def make_case(H=64, W=80, seed=0):
    r = np.random.default_rng(seed)
    K = make_K(H, W, f=90.0)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    depth = (2.0 + 0.15 * np.sin(u * 0.15) + 0.1 * np.cos(v * 0.18)).astype(np.float32)
    normals = normals_from_depth(depth, K)
    masks = np.zeros((4, H, W), bool)
    masks[0, 4:20, 6:26] = True          # small
    masks[1, 30:58, 40:72] = True        # small, near border
    masks[2, 10:26, 50:74] = True        # small
    masks[3, 2:62, 2:78] = True          # oversized for crop=32
    return K, normals, masks, depth


class TestCroppedBini:
    def test_matches_full_field_for_fitting(self):
        K, normals, masks, _ = make_case()
        cfg = BiniConfig(cg_tol=1e-6, cg_max_iter=2000)
        full = np.asarray(
            integrate_normals(jnp.asarray(normals), jnp.asarray(masks[:3]), K, cfg)
        )
        cropped = np.asarray(
            integrate_normals_cropped(
                jnp.asarray(normals), jnp.asarray(masks[:3]), K, cfg, crop=32
            )
        )
        for i in range(3):
            m = masks[i]
            np.testing.assert_allclose(cropped[i][m], full[i][m], atol=2e-3)
            assert np.all(cropped[i][~m] == 0)

    def test_bbox_sizes(self):
        _, _, masks, _ = make_case()
        hs, ws = segment_bbox_sizes(masks)
        np.testing.assert_array_equal(hs, [16, 28, 16, 60])
        np.testing.assert_array_equal(ws, [20, 32, 24, 76])

    def test_depth_recovery_cropped(self):
        K, normals, masks, depth = make_case()
        cfg = BiniConfig(cg_tol=1e-6, cg_max_iter=2000)
        zt = np.asarray(
            integrate_normals_cropped(
                jnp.asarray(normals), jnp.asarray(masks[:3]), K, cfg, crop=48
            )
        )
        lt = np.log(depth)
        for i in range(3):
            m = masks[i]
            diff = zt[i][m] - lt[m]
            diff -= diff.mean()
            assert np.abs(diff).max() < 0.05, (i, np.abs(diff).max())

    def test_frontend_routing(self):
        """FrontProcessor dispatch/fetch integration: small go cropped, big
        go full, outputs cover all segments."""
        from super_primitive_tpu.config import load_config
        from super_primitive_tpu.frontend.process_frame import FrontProcessor

        K, normals, masks, depth = make_case()
        cfg = load_config({})
        fp = FrontProcessor(cfg, None, None)
        bini_cfg = BiniConfig(cg_tol=1e-5, cg_max_iter=1000)
        h = fp._dispatch_integration(
            jnp.asarray(normals), masks, jnp.asarray(np.asarray(K), jnp.float32),
            bini_cfg, crop=32,
        )
        out = fp._fetch_integration(h)
        assert out.shape == masks.shape
        for i in range(4):
            vals = out[i][masks[i]]
            assert np.all(vals > 0), i      # depth, not logdepth
            assert np.all(out[i][~masks[i]] == 0)

    def test_crop_fetch_matches_full_scatter(self):
        """return_crops host scatter == the device full-field scatter path."""
        K, normals, masks, depth = make_case()
        cfg = BiniConfig(cg_tol=1e-5, cg_max_iter=500)
        small = masks[:3]
        full = np.asarray(
            integrate_normals_cropped(
                jnp.asarray(normals), jnp.asarray(small), K, cfg, crop=48
            )
        )
        zt_c, r0, c0 = integrate_normals_cropped(
            jnp.asarray(normals), jnp.asarray(small), K, cfg, crop=48,
            return_crops=True,
        )
        zt_c, r0, c0 = np.asarray(zt_c), np.asarray(r0), np.asarray(c0)
        H, W = small.shape[1:]
        recon = np.zeros((3, H, W), np.float32)
        ch, cw = zt_c.shape[1:]
        for j in range(3):
            recon[j, r0[j] : r0[j] + ch, c0[j] : c0[j] + cw] = zt_c[j]
        recon *= small
        np.testing.assert_allclose(recon, full, atol=1e-6)
