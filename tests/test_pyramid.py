"""Pyramid/gradient parity vs torch conv oracle (reference
image/gaussian_pyramid.py, image/image_processing.py)."""

import jax.numpy as jnp
import numpy as np
import torch

from super_primitive_tpu.image.gradients import scharr_gradients
from super_primitive_tpu.image.pyramid import (
    average_pool2,
    binomial_blur,
    grayscale,
    image_pyramid,
    intrinsics_pyramid,
    nn_downsample_pyramid,
)


def torch_blur(img_chw):
    k = (1.0 / 16.0) * torch.tensor([[1.0, 2, 1], [2, 4, 2], [1, 2, 1]])
    C = img_chw.shape[0]
    kk = k.repeat(C, 1, 1, 1)
    x = torch.from_numpy(img_chw)[None]
    out = torch.nn.functional.conv2d(
        torch.nn.functional.pad(x, (1, 1, 1, 1), mode="reflect"), kk, groups=C
    )
    return out[0].numpy()


def torch_scharr(img_chw, reflect=True):
    kx = (1.0 / 32.0) * torch.tensor([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]])
    ky = kx.T.clone()
    C = img_chw.shape[0]
    x = torch.from_numpy(img_chw)[None]
    mode = "reflect" if reflect else "constant"
    p = torch.nn.functional.pad(x, (1, 1, 1, 1), mode=mode)
    gx = torch.nn.functional.conv2d(p, kx.repeat(C, 1, 1, 1), groups=C)[0].numpy()
    gy = torch.nn.functional.conv2d(p, ky.repeat(C, 1, 1, 1), groups=C)[0].numpy()
    return gx, gy


def rand_img(seed, H=33, W=47, C=3):
    return np.random.default_rng(seed).uniform(0, 1, (C, H, W)).astype(np.float32)


class TestBlur:
    def test_matches_torch_conv(self):
        img = rand_img(0)
        ours = np.asarray(binomial_blur(jnp.asarray(img.transpose(1, 2, 0))))
        ref = torch_blur(img)
        np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-6)

    def test_pyramid_shapes_and_order(self):
        img = jnp.zeros((64, 96, 3))
        p = image_pyramid(img, 0, 4)
        # coarsest-first: level 3 ... level 0
        assert [x.shape[:2] for x in p] == [(8, 12), (16, 24), (32, 48), (64, 96)]

    def test_pyramid_start_level(self):
        img = jnp.zeros((64, 96, 3))
        p = image_pyramid(img, 1, 3)
        assert [x.shape[:2] for x in p] == [(16, 24), (32, 48)]

    def test_pyramid_level1_matches_torch(self):
        img = rand_img(1, 32, 48)
        p = image_pyramid(jnp.asarray(img.transpose(1, 2, 0)), 0, 2)
        ref = torch_blur(img)[:, 0::2, 0::2]
        np.testing.assert_allclose(
            np.asarray(p[0]).transpose(2, 0, 1), ref, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(p[1]).transpose(2, 0, 1), img, atol=0)


class TestDepthPyramid:
    def test_nn_downsample(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(16, 24, 5)).astype(np.float32))
        p = nn_downsample_pyramid(x, 0, 3)
        np.testing.assert_array_equal(np.asarray(p[-1]), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(p[1]), np.asarray(x)[::2, ::2])
        np.testing.assert_array_equal(np.asarray(p[0]), np.asarray(x)[::4, ::4])

    def test_average_pool(self):
        x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
        out = np.asarray(average_pool2(x))
        expected = torch.nn.functional.avg_pool2d(
            torch.from_numpy(np.asarray(x)).permute(2, 0, 1)[None], 2, 2
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(out, expected)


class TestIntrinsics:
    def test_pyramid_matches_reference_convention(self):
        K = jnp.asarray([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
        p = intrinsics_pyramid(K, 0, 3)
        assert len(p) == 3
        # reference convention (gaussian_pyramid.py:46-48): T's translation
        # column carries the scale factor itself, even at scale 1
        T1 = np.array([[1.0, 0, 1.0], [0, 1.0, 1.0], [0, 0, 1]])
        np.testing.assert_allclose(np.asarray(p[-1]), T1 @ np.asarray(K), atol=1e-6)
        T = np.array([[0.25, 0, 0.25], [0, 0.25, 0.25], [0, 0, 1]])
        np.testing.assert_allclose(np.asarray(p[0]), T @ np.asarray(K), atol=1e-6)


class TestGradients:
    def test_scharr_matches_torch_reflect(self):
        img = rand_img(3)
        gx, gy = scharr_gradients(jnp.asarray(img.transpose(1, 2, 0)))
        rgx, rgy = torch_scharr(img, reflect=True)
        np.testing.assert_allclose(np.asarray(gx).transpose(2, 0, 1), rgx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy).transpose(2, 0, 1), rgy, atol=1e-6)

    def test_scharr_matches_torch_zeros(self):
        img = rand_img(4)
        gx, gy = scharr_gradients(jnp.asarray(img.transpose(1, 2, 0)), reflect_padding=False)
        rgx, rgy = torch_scharr(img, reflect=False)
        np.testing.assert_allclose(np.asarray(gx).transpose(2, 0, 1), rgx, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy).transpose(2, 0, 1), rgy, atol=1e-6)


class TestGrayscale:
    def test_matches_torchvision_weights(self):
        img = rand_img(5)
        ours = np.asarray(grayscale(jnp.asarray(img.transpose(1, 2, 0))))[..., 0]
        ref = 0.299 * img[0] + 0.587 * img[1] + 0.114 * img[2]
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestDepthPoolModes:
    """All reference pyr_depth modes (image/gaussian_pyramid.py:8-29) vs the
    torch formulas, kernel_size=2."""

    def _torch_pyr_depth(self, depth_hw, mode):
        d = torch.from_numpy(depth_hw)[None, None]
        if mode == "bilinear":
            out = torch.nn.functional.avg_pool2d(d, 2, 2)
        elif mode == "nearest_neighbor":
            out = d[:, :, 0::2, 0::2]
        elif mode == "max":
            out = torch.nn.functional.max_pool2d(d, 2)
        elif mode == "min":
            out = -torch.nn.functional.max_pool2d(-d, 2)
        elif mode == "masked_bilinear":
            mask = ~d.isnan()
            dm = torch.zeros_like(d)
            dm[mask] = d[mask]
            s = torch.nn.functional.avg_pool2d(dm, 2, 2, divisor_override=1)
            m = torch.nn.functional.avg_pool2d(mask.float(), 2, 2, divisor_override=1)
            out = torch.where(m > 0.0, s / m, torch.tensor(0.0))
        return out[0, 0].numpy()

    def test_all_modes_match_torch(self):
        from super_primitive_tpu.image.pyramid import pool_depth2

        rng = np.random.default_rng(7)
        depth = rng.uniform(0.1, 5.0, size=(17, 23)).astype(np.float32)
        nan_depth = depth.copy()
        nan_depth[rng.uniform(size=depth.shape) < 0.3] = np.nan
        for mode in ["bilinear", "nearest_neighbor", "max", "min"]:
            ours = np.asarray(pool_depth2(jnp.asarray(depth), mode))
            ref = self._torch_pyr_depth(depth, mode)
            np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=mode)
        ours = np.asarray(pool_depth2(jnp.asarray(nan_depth), "masked_bilinear"))
        ref = self._torch_pyr_depth(nan_depth, "masked_bilinear")
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_depth_pyramid_nn_matches_existing(self):
        from super_primitive_tpu.image.pyramid import depth_pyramid

        rng = np.random.default_rng(3)
        depth = rng.uniform(0.1, 5.0, size=(32, 40)).astype(np.float32)
        a = depth_pyramid(jnp.asarray(depth), 0, 3, "nearest_neighbor")
        b = nn_downsample_pyramid(jnp.asarray(depth), 0, 3)
        assert len(a) == len(b) == 3
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_unknown_mode_raises(self):
        from super_primitive_tpu.image.pyramid import pool_depth2

        try:
            pool_depth2(jnp.zeros((4, 4)), "bogus")
            assert False, "expected ValueError"
        except ValueError:
            pass
