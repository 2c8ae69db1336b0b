"""Depth completion + VOID metrics tests (stub frontend)."""

import numpy as np

from super_primitive_tpu.depth_completion.completion import (
    DepthCompletion,
    render_depth_avg,
)
from super_primitive_tpu.depth_completion.fill_in import fill_single_griddata
from super_primitive_tpu.depth_completion.metrics import (
    ErrorMetrics,
    ErrorMetricsAverager,
    delta_metric,
)


# the stub moved into the package so evaluate_void.py --stub-frontend can
# share it (the VOID CLI e2e, tests/test_cli_void.py)
from super_primitive_tpu.frontend.stub import PatchSegmentFrontend as PatchFrontend


def make_case(H=40, W=52, n_sparse=25, seed=0):
    r = np.random.default_rng(seed)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    gt = (1.5 + 0.3 * np.sin(u * 0.1) + 0.2 * np.cos(v * 0.13)).astype(np.float32)
    sparse = np.zeros((H, W), np.float32)
    idx = r.choice(H * W, n_sparse, replace=False)
    sparse.reshape(-1)[idx] = gt.reshape(-1)[idx]
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1.0]])
    return gt, sparse, K


class TestCompletion:
    def test_exact_on_gt_logdepth(self):
        gt, sparse, K = make_case()
        fe = PatchFrontend(gt)
        dc = DepthCompletion(fe)
        img = np.zeros((*gt.shape, 3), np.uint8)
        depth, invalid = dc.depth_completion(img, K, sparse)
        # where covered, completion must equal GT (shift alignment exact)
        np.testing.assert_allclose(depth[~invalid], gt[~invalid], rtol=1e-5)
        assert (~invalid).sum() > 0

    def test_fallback_rerun_on_low_coverage(self):
        gt, _, K = make_case(n_sparse=2)  # tiny coverage -> rerun
        sparse = np.zeros_like(gt)
        sparse[5, 5] = gt[5, 5]
        sparse[30, 40] = gt[30, 40]
        fe = PatchFrontend(gt, patch=5)
        dc = DepthCompletion(fe)
        depth, invalid = dc.depth_completion(
            np.zeros((*gt.shape, 3), np.uint8), K, sparse
        )
        assert fe.calls == [False, True]  # fallback triggered
        assert (~invalid).sum() > 25      # loose patch covers more

    def test_render_depth_avg_overlap(self):
        d = np.full((2, 4, 4), -1.0, np.float32)
        d[0, :2] = 2.0
        d[1, 1:3] = 4.0
        avg, invalid = render_depth_avg(d)
        np.testing.assert_allclose(avg[0, 0], 2.0, rtol=1e-5)
        np.testing.assert_allclose(avg[1, 0], 3.0, rtol=1e-5)  # overlap average
        np.testing.assert_allclose(avg[2, 0], 4.0, rtol=1e-5)
        assert invalid[3, 0]

    def test_fill_griddata(self):
        gt, _, _ = make_case()
        invalid = np.zeros_like(gt, bool)
        invalid[10:20, 10:20] = True
        depth = gt.copy()
        depth[invalid] = 0
        filled = fill_single_griddata(depth, invalid)
        assert np.all(np.isfinite(filled))
        # interpolation of a smooth field should be close
        assert np.abs(filled - gt).max() < 0.05


class TestMetrics:
    def test_formulas(self):
        r = np.random.default_rng(1)
        est = r.uniform(1.0, 3.0, (30, 40)).astype(np.float64)
        tgt = est + r.normal(0, 0.1, est.shape)
        valid = np.ones_like(est, bool)
        m = ErrorMetrics()
        m.compute(est, tgt, valid)
        np.testing.assert_allclose(
            m.rmse, np.sqrt(np.mean((1000 * (est - tgt)) ** 2))
        )
        np.testing.assert_allclose(
            m.inv_mae, np.mean(np.abs(1 / (0.001 * est) - 1 / (0.001 * tgt)))
        )

    def test_averager(self):
        avg = ErrorMetricsAverager()
        for v in (1.0, 3.0):
            m = ErrorMetrics()
            m.rmse = m.mae = m.absrel = v
            m.inv_rmse = m.inv_mae = m.inv_absrel = v * 2
            avg.accumulate(m)
        avg.average()
        assert avg.rmse_avg == 2.0
        assert avg.inv_rmse_avg == 4.0

    def test_delta(self):
        est = np.asarray([1.0, 1.2, 2.0])
        tgt = np.asarray([1.0, 1.0, 1.0])
        d = delta_metric(est, tgt)
        np.testing.assert_allclose(d["a1"], 2 / 3)  # <1.25: [1.0, 1.2]
        np.testing.assert_allclose(d["a5"], 1 / 3)


class TestVoidDataset:
    """VOID-format directory parsing (data/void.py vs reference
    evaluate_void.py:87-116: /256 depth scale, [0.2, 5] gt range mask,
    invalid gt -> inf, K.txt two levels up from the image)."""

    def test_roundtrip(self, tmp_path):
        import cv2

        from super_primitive_tpu.data.void import VoidDataset

        scene = tmp_path / "void" / "scene0" / "data"
        for sub in ("image", "sparse_depth", "validity_map", "ground_truth"):
            (scene / sub).mkdir(parents=True)
        r = np.random.default_rng(0)
        H, W = 48, 64
        img = r.integers(0, 255, (H, W, 3), np.uint8)
        gt = r.uniform(0.05, 6.0, (H, W)).astype(np.float32)
        sparse = np.where(r.random((H, W)) < 0.02, gt, 0.0)
        cv2.imwrite(str(scene / "image" / "0.png"), img[..., ::-1])
        cv2.imwrite(str(scene / "sparse_depth" / "0.png"),
                    (sparse * 256).astype(np.uint16))
        cv2.imwrite(str(scene / "validity_map" / "0.png"),
                    (sparse > 0).astype(np.uint16) * 256)
        cv2.imwrite(str(scene / "ground_truth" / "0.png"),
                    (gt * 256).astype(np.uint16))
        K = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])
        np.savetxt(str(scene / "K.txt"), K)
        (tmp_path / "void" / "test_image.txt").write_text(
            "scene0/data/image/0.png\n"
        )

        ds = VoidDataset(str(tmp_path / "void"))
        assert len(ds) == 1
        s = ds[0]
        np.testing.assert_array_equal(s["image"], img)
        np.testing.assert_allclose(s["sparse_depth"],
                                   np.floor(sparse * 256) / 256, atol=1e-6)
        np.testing.assert_allclose(s["intrinsics"], K)
        # gt range mask [0.2, 5]; out-of-range -> inf
        q = np.floor(gt * 256) / 256  # uint16 write truncates
        in_range = (q > 0.2) & (q < 5.0)
        np.testing.assert_array_equal(s["gt_valid"], in_range)
        assert np.all(np.isinf(s["gt_depth"][~in_range]))
        np.testing.assert_allclose(s["gt_depth"][in_range], q[in_range],
                                   atol=1e-6)
        np.testing.assert_array_equal(s["validity_map"], (sparse > 0) * 1.0)
