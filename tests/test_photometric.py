"""Parity tests for the photometric cost against a torch oracle implementing
the reference equations (core/dense_optim.py) with ragged torch.where
extraction — the strongest convention check in the suite.

torch (CPU) is a test oracle only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from super_primitive_tpu.cost import photometric as ph
from super_primitive_tpu.keyframe import (
    PointBundle,
    build_bundle,
    build_bundle_np,
    make_segment_geometry,
)
from super_primitive_tpu.lie import se3


def make_scene(seed=0, N=3, H=24, W=32, C=3):
    r = np.random.default_rng(seed)
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1.0]], np.float32)
    img_src = r.uniform(0, 1, (H, W, C)).astype(np.float32)
    img_trg = r.uniform(0, 1, (H, W, C)).astype(np.float32)
    regions = np.zeros((N, H, W), bool)
    for i in range(N):
        r0, c0 = r.integers(0, H - 8), r.integers(0, W - 8)
        regions[i, r0 : r0 + r.integers(4, 8), c0 : c0 + r.integers(4, 8)] = True
    logdepth = (r.uniform(0.3, 0.8, (N, H, W)).astype(np.float32)) * regions
    # keypoints: center of each region, normalized (row, col)
    kps = []
    for i in range(N):
        rr, cc = np.nonzero(regions[i])
        kps.append([rr[len(rr) // 2], cc[len(cc) // 2]])
    kp_px = np.asarray(kps, np.float32)
    dims = np.asarray([H, W], np.float32)
    keypoints = (2 * kp_px / (dims - 1) - 1).astype(np.float32)
    kp_logdepth = r.uniform(0.2, 1.0, (N,)).astype(np.float32)
    pose = np.asarray(
        se3.exp(jnp.asarray([0.03, -0.02, 0.01, 0.05, 0.03, -0.02]))
    ).astype(np.float32)
    return K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, pose


def torch_oracle(img_src, img_trg, K, regions, logdepth_perseg, keypoints, kp_logdepth,
                 pose, affine=None, z_thresh=1e-7):
    """Reference pipeline (core/dense_optim.py:265-363) re-derived in torch."""
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    N, H, W = regions.shape
    K = t(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # infer_depth_seeds
    dims = torch.tensor([H, W], dtype=torch.float32)
    kp_px = torch.round(0.5 * (dims - 1) * (t(keypoints) + 1)).long()
    b_idx = torch.arange(N)
    unscaled = t(logdepth_perseg)[b_idx, kp_px[:, 0], kp_px[:, 1]]
    shifts = t(kp_logdepth) - unscaled
    logdepth = (t(logdepth_perseg) + shifts[:, None, None]) * t(regions.astype(np.float32))
    depth = torch.exp(logdepth)

    b, r, c = torch.where(torch.from_numpy(regions))
    z = depth[b, r, c]
    x = (c.float() - cx) * z / fx
    y = (r.float() - cy) * z / fy
    pts = torch.stack([x, y, z], dim=1)

    def project(p):
        eps = 1e-6
        zz = p[:, 2]
        z_inv = torch.where(zz.abs() > eps, 1.0 / torch.where(zz.abs() > eps, zz, torch.ones_like(zz)), torch.full_like(zz, eps))
        return torch.stack([p[:, 0] * fx * z_inv + cx, p[:, 1] * fy * z_inv + cy], dim=1)

    def get_pixels(img_hwc, p):
        valid_z = p[:, 2].detach() > z_thresh
        uv = project(p)
        norm = torch.stack([2 * uv[:, 0] / (W - 1) - 1, 2 * uv[:, 1] / (H - 1) - 1], dim=1)
        valid = (norm.abs() <= 0.99).all(dim=-1)
        img = t(img_hwc).permute(2, 0, 1)[None]
        sampled = torch.nn.functional.grid_sample(
            img, norm[None, None], mode="bilinear", padding_mode="zeros", align_corners=True
        )[0, :, 0]
        return sampled, valid & valid_z

    src_px, src_valid = get_pixels(img_src, pts)
    P = t(pose)
    pts_t = pts @ P[:3, :3].T + P[:3, 3]
    trg_px, trg_valid = get_pixels(img_trg, pts_t)

    if affine is not None:
        a_s, a_t_ = t(affine[0]), t(affine[1])
        aa = a_t_[0] - a_s[0]
        bb = a_t_[1] - a_s[1]
        trg_px = torch.cat([torch.exp(-aa) * trg_px[:3] + bb, trg_px[3:]], dim=0)

    mask = (src_valid & trg_valid).float()[None]
    res = (src_px - trg_px) * mask
    return float(res.abs().mean())


class TestBundle:
    def test_np_and_device_extraction_agree(self):
        K, _, _, regions, logdepth, keypoints, _, _ = make_scene(1)
        geo = make_segment_geometry(keypoints, regions, logdepth)
        b_np = build_bundle_np(regions, logdepth, capacity=2048)
        b_dev = build_bundle(geo, capacity=2048)
        np.testing.assert_array_equal(np.asarray(b_np.uv), np.asarray(b_dev.uv))
        np.testing.assert_array_equal(np.asarray(b_np.seg_id), np.asarray(b_dev.seg_id))
        np.testing.assert_allclose(
            np.asarray(b_np.base_logdepth), np.asarray(b_dev.base_logdepth)
        )
        np.testing.assert_array_equal(np.asarray(b_np.valid), np.asarray(b_dev.valid))
        assert int(b_np.num_valid) == int(b_dev.num_valid) == int(regions.sum())

    def test_kp_base_logdepth(self):
        K, _, _, regions, logdepth, keypoints, _, _ = make_scene(2)
        geo = make_segment_geometry(keypoints, regions, logdepth)
        base = np.asarray(geo.keypoint_base_logdepth())
        dims = np.asarray(regions.shape[1:], np.float32)
        kp_px = np.round(0.5 * (dims - 1) * (keypoints + 1)).astype(int)
        expected = logdepth[np.arange(3), kp_px[:, 0], kp_px[:, 1]]
        np.testing.assert_allclose(base, expected)


class TestPhotometricCost:
    def _cost(self, scene, pose, kp_logdepth, affine=None):
        K, img_src, img_trg, regions, logdepth, keypoints, _, _ = scene
        geo = make_segment_geometry(keypoints, regions, logdepth)
        bundle = build_bundle_np(regions, logdepth, capacity=2048)
        geo_dims = regions.shape[1:]
        src = ph.precompute_source(jnp.asarray(img_src), bundle, geo_dims)
        return ph.photometric_cost(
            bundle,
            src,
            jnp.asarray(img_trg),
            jnp.asarray(K),
            geo_dims,
            jnp.asarray(kp_logdepth),
            geo.keypoint_base_logdepth(),
            jnp.asarray(pose),
            affine=affine,
        )

    def test_matches_torch_oracle(self):
        scene = make_scene(3)
        K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, pose = scene
        got = float(self._cost(scene, pose, kp_logdepth))
        want = torch_oracle(
            img_src, img_trg, K, regions, logdepth, keypoints, kp_logdepth, pose
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_matches_oracle_identity_pose(self):
        scene = make_scene(4)
        K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, _ = scene
        eye = np.eye(4, dtype=np.float32)
        got = float(self._cost(scene, eye, kp_logdepth))
        want = torch_oracle(
            img_src, img_trg, K, regions, logdepth, keypoints, kp_logdepth, eye
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_zero_residual_same_image_identity(self):
        scene = make_scene(5)
        K, img_src, _, regions, logdepth, keypoints, kp_logdepth, _ = scene
        scene_same = (K, img_src, img_src, regions, logdepth, keypoints, kp_logdepth, None)
        got = float(self._cost(scene_same, np.eye(4, dtype=np.float32), kp_logdepth))
        assert got < 1e-6

    def test_affine_matches_oracle(self):
        scene = make_scene(6)
        K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, pose = scene
        a_src = np.asarray([0.1, -0.05], np.float32)
        a_trg = np.asarray([-0.2, 0.03], np.float32)
        got = float(
            self._cost(scene, pose, kp_logdepth, affine=(jnp.asarray(a_src), jnp.asarray(a_trg)))
        )
        want = torch_oracle(
            img_src, img_trg, K, regions, logdepth, keypoints, kp_logdepth, pose,
            affine=(a_src, a_trg),
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_batch_matches_singles(self):
        scene = make_scene(7)
        K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, pose = scene
        r = np.random.default_rng(8)
        poses = np.stack(
            [
                pose,
                np.asarray(se3.exp(jnp.asarray(0.05 * r.normal(size=6).astype(np.float32)))),
                np.eye(4, dtype=np.float32),
            ]
        )
        imgs = np.stack([img_trg, img_src, img_trg])
        geo = make_segment_geometry(keypoints, regions, logdepth)
        bundle = build_bundle_np(regions, logdepth, capacity=2048)
        geo_dims = regions.shape[1:]
        src = ph.precompute_source(jnp.asarray(img_src), bundle, geo_dims)
        batch = np.asarray(
            ph.photometric_cost_batch(
                bundle, src, jnp.asarray(imgs), jnp.asarray(K), geo_dims,
                jnp.asarray(kp_logdepth), geo.keypoint_base_logdepth(), jnp.asarray(poses),
            )
        )
        for i in range(3):
            single = float(
                ph.photometric_cost(
                    bundle, src, jnp.asarray(imgs[i]), jnp.asarray(K), geo_dims,
                    jnp.asarray(kp_logdepth), geo.keypoint_base_logdepth(),
                    jnp.asarray(poses[i]),
                )
            )
            np.testing.assert_allclose(batch[i], single, rtol=1e-5, atol=1e-7)

    def test_resolution_independent_sampling(self):
        # target image downsampled 2x: residual still finite & comparable
        # (geo_down=False semantics — normalized coords span the image)
        scene = make_scene(9)
        K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, pose = scene
        geo = make_segment_geometry(keypoints, regions, logdepth)
        bundle = build_bundle_np(regions, logdepth, capacity=2048)
        geo_dims = regions.shape[1:]
        src = ph.precompute_source(jnp.asarray(img_src), bundle, geo_dims)
        small = jnp.asarray(img_trg[::2, ::2])
        res = float(
            ph.photometric_cost(
                bundle, src, small, jnp.asarray(K), geo_dims,
                jnp.asarray(kp_logdepth), geo.keypoint_base_logdepth(), jnp.asarray(pose),
            )
        )
        assert np.isfinite(res) and res > 0

    def test_grad_wrt_depth_and_pose(self):
        scene = make_scene(10)
        K, img_src, img_trg, regions, logdepth, keypoints, kp_logdepth, pose = scene
        geo = make_segment_geometry(keypoints, regions, logdepth)
        bundle = build_bundle_np(regions, logdepth, capacity=2048)
        geo_dims = regions.shape[1:]
        src = ph.precompute_source(jnp.asarray(img_src), bundle, geo_dims)
        kp_base = geo.keypoint_base_logdepth()

        def loss(kp_ld, xi):
            return ph.photometric_cost(
                bundle, src, jnp.asarray(img_trg), jnp.asarray(K), geo_dims,
                kp_ld, kp_base, se3.retract(jnp.asarray(pose), xi),
            )

        g_ld, g_xi = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(kp_logdepth), jnp.zeros(6)
        )
        assert np.all(np.isfinite(np.asarray(g_ld)))
        assert np.all(np.isfinite(np.asarray(g_xi)))
        assert np.any(np.asarray(g_ld) != 0)
        assert np.any(np.asarray(g_xi) != 0)
