"""Native C++ loader tests: decode parity, prefetch behavior, TUM wiring."""

import os
import time

import cv2
import numpy as np
import pytest

from super_primitive_tpu.data.native_loader import NativeImageLoader, get_lib
from super_primitive_tpu.data.tum import TUMDataset

pytestmark = pytest.mark.skipif(not get_lib(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    r = np.random.default_rng(0)
    paths = {"rgb": [], "depth": [], "jpg": []}
    for i in range(5):
        p = str(d / f"rgb{i}.png")
        cv2.imwrite(p, r.integers(0, 255, (32, 40, 3), np.uint8))
        paths["rgb"].append(p)
        p = str(d / f"d{i}.png")
        cv2.imwrite(p, r.integers(0, 60000, (32, 40)).astype(np.uint16))
        paths["depth"].append(p)
        p = str(d / f"j{i}.jpg")
        cv2.imwrite(p, r.integers(0, 255, (32, 40, 3), np.uint8))
        paths["jpg"].append(p)
    return paths


class TestNativeLoader:
    def test_png_rgb_exact(self, image_dir):
        nl = NativeImageLoader(image_dir["rgb"])
        for i, p in enumerate(image_dir["rgb"]):
            ref = cv2.imread(p)[..., ::-1]
            np.testing.assert_array_equal(nl[i], ref)
        nl.close()

    def test_png_depth16_exact(self, image_dir):
        nl = NativeImageLoader(image_dir["depth"])
        for i, p in enumerate(image_dir["depth"]):
            ref = cv2.imread(p, -1)
            got = nl[i]
            assert got.dtype == np.uint16
            np.testing.assert_array_equal(got, ref)
        nl.close()

    def test_jpeg_close(self, image_dir):
        nl = NativeImageLoader(image_dir["jpg"])
        for i, p in enumerate(image_dir["jpg"]):
            ref = cv2.imread(p)[..., ::-1]
            got = nl[i]
            assert got.shape == ref.shape
            assert np.abs(got.astype(int) - ref.astype(int)).mean() < 3
        nl.close()

    def test_random_access_and_reuse(self, image_dir):
        nl = NativeImageLoader(image_dir["rgb"], num_threads=2, lookahead=2)
        a = nl[3]
        b = nl[0]
        c = nl[3]  # re-request already-consumed index
        ref3 = cv2.imread(image_dir["rgb"][3])[..., ::-1]
        np.testing.assert_array_equal(a, ref3)
        np.testing.assert_array_equal(c, ref3)
        nl.close()

    def test_decode_error(self, tmp_path):
        bad = str(tmp_path / "bad.png")
        with open(bad, "wb") as f:
            f.write(b"not a png")
        nl = NativeImageLoader([bad])
        with pytest.raises(IOError):
            nl[0]
        nl.close()


class TestTumNative:
    def test_native_matches_cv2_path(self, tmp_path):
        root = str(tmp_path) + "/"
        os.makedirs(root + "rgb")
        os.makedirs(root + "depth")
        r = np.random.default_rng(1)
        assoc = []
        for i in range(3):
            ts = 1.0 + i
            cv2.imwrite(root + f"rgb/{i}.png", r.integers(0, 255, (48, 64, 3), np.uint8))
            cv2.imwrite(root + f"depth/{i}.png",
                        (r.uniform(0.5, 3, (48, 64)) * 5000).astype(np.uint16))
            assoc.append(f"{ts} rgb/{i}.png {ts} depth/{i}.png")
        open(root + "associations.txt", "w").write("\n".join(assoc))

        ds_native = TUMDataset(root, native=True)
        ds_plain = TUMDataset(root, native=False)
        assert ds_native._rgb_loader is not None
        for i in range(3):
            a, b = ds_native[i], ds_plain[i]
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_allclose(a["depth"], b["depth"])


class TestNativeUndistort:
    K = np.array([[520.9, 0, 321.5], [0, 521.0, 249.7], [0, 0, 1]], np.float64)
    DIST = np.array([0.2312, -0.7849, -0.0033, -0.0001, 0.9172], np.float64)

    @pytest.fixture(autouse=True)
    def _need_lib(self):
        if not get_lib():
            pytest.skip("native lib unavailable")

    def test_maps_match_cv2(self):
        from super_primitive_tpu.data.native_loader import undistort_maps

        h, w = 120, 160
        K = self.K.copy()
        K[0, 2], K[1, 2] = w / 2, h / 2
        mx, my = undistort_maps(K, self.DIST, h, w)
        cx, cy = cv2.initUndistortRectifyMap(
            K, self.DIST, None, K, (w, h), cv2.CV_32FC1
        )
        np.testing.assert_allclose(mx, cx, atol=1e-3)
        np.testing.assert_allclose(my, cy, atol=1e-3)

    def test_remap_matches_cv2_undistort(self):
        from super_primitive_tpu.data.native_loader import (
            remap_u8,
            undistort_maps,
        )

        r = np.random.default_rng(0)
        h, w = 120, 160
        K = self.K.copy()
        K[0, 2], K[1, 2] = w / 2, h / 2
        mx, my = undistort_maps(K, self.DIST, h, w)
        # cv2.remap quantizes interpolation weights to 1/32: the error bound
        # scales with local contrast, so check the interior (smooth) tightly
        # and the border zone (constant-0 taps against bright pixels) loosely
        interior = (
            (mx >= 0) & (mx < w - 1) & (my >= 0) & (my < h - 1)
        )[..., None]

        yy, xx = np.mgrid[:h, :w].astype(np.float32)
        smooth = np.stack(
            [200 * xx / w, 200 * yy / h, 100 * (xx / w + yy / h)], -1
        ).astype(np.uint8)
        diff = np.abs(
            remap_u8(smooth, mx, my).astype(int)
            - cv2.undistort(smooth, K, self.DIST).astype(int)
        )
        assert diff[np.broadcast_to(interior, diff.shape)].max() <= 2, diff.max()
        assert diff.max() <= 8, diff.max()

        img = r.integers(0, 255, (h, w, 3), np.uint8)
        diff = np.abs(
            remap_u8(img, mx, my).astype(int)
            - cv2.undistort(img, K, self.DIST).astype(int)
        )
        assert diff.max() <= 16, diff.max()
        assert (diff > 2).mean() < 0.08

    def test_loader_pipeline_undistort(self, tmp_path):
        from super_primitive_tpu.data.native_loader import undistort_maps

        r = np.random.default_rng(1)
        h, w = 96, 128
        K = self.K.copy()
        K[0, 2], K[1, 2] = w / 2, h / 2
        paths = []
        imgs = []
        for i in range(4):
            img = r.integers(0, 255, (h, w, 3), np.uint8)
            p = str(tmp_path / f"im{i}.png")
            cv2.imwrite(p, img[..., ::-1])  # loader returns RGB
            paths.append(p)
            imgs.append(img)
        loader = NativeImageLoader(paths, num_threads=2, lookahead=4)
        maps = undistort_maps(K, self.DIST, h, w)
        assert loader.set_undistort(*maps)
        for i in (0, 2, 3, 1):  # includes an index possibly prefetched pre-maps
            got = loader[i]
            ref = cv2.undistort(imgs[i], K, self.DIST)
            diff = np.abs(got.astype(int) - ref.astype(int))
            # random image: cv2's fixed-point interpolation allows ~255/32
            assert diff.max() <= 16, (i, diff.max())
            assert (diff > 2).mean() < 0.08, i
        loader.close()
