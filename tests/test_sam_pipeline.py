"""Integration: the REAL SamPredictor (tiny ViT config, random weights)
driving the mask-generation pipeline and the full frontend — validates the
net plumbing (resize/pad/encode/prompt/decode/postprocess) end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_primitive_tpu.config import load_config
from super_primitive_tpu.frontend.mask_generation import infer_masks
from super_primitive_tpu.nets.sam.image_encoder import VIT_TINY_TEST, ImageEncoderViT
from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
from super_primitive_tpu.nets.sam.predictor import SamPredictor
from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = VIT_TINY_TEST
    key = jax.random.PRNGKey(0)
    S = cfg.img_size // cfg.patch_size
    enc = ImageEncoderViT(cfg)
    pe = PromptEncoder(
        embed_dim=cfg.out_chans, image_embedding_size=(S, S),
        input_image_size=(cfg.img_size, cfg.img_size),
    )
    dec = MaskDecoder(transformer_dim=cfg.out_chans)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "image_encoder": enc.init(k1, jnp.zeros((1, cfg.img_size, cfg.img_size, 3)))["params"],
        "prompt_encoder": pe.init(k2, jnp.zeros((1, 2, 2)), jnp.zeros((1, 2)))["params"],
        "mask_decoder": dec.init(
            k3, jnp.zeros((1, S, S, cfg.out_chans)), jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((2, 2, cfg.out_chans)), jnp.zeros((2, S, S, cfg.out_chans)),
        )["params"],
    }
    return SamPredictor(params, cfg)


class TestSamPredictorPipeline:
    def test_set_image_and_predict(self, tiny_predictor):
        r = np.random.default_rng(0)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)  # non-square
        tiny_predictor.set_image(image)
        assert tiny_predictor._input_hw == (51, 64)  # longest side -> 64
        pts = np.asarray([[10.0, 20.0], [40.0, 30.0], [5.0, 45.0]])
        masks, iou = tiny_predictor.predict_batched_points(pts)
        assert masks.shape == (3, 3, 48, 60)   # 3 prompts x 3 multimask @ orig res
        assert iou.shape == (3, 3)
        assert np.all(np.isfinite(np.asarray(masks)))

    def test_preload_image_matches_direct(self, tiny_predictor):
        """preload_image (async upload) + set_image == plain set_image, and
        the preload cache is single-use / identity-keyed."""
        r = np.random.default_rng(7)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)
        tiny_predictor._last_image = None
        tiny_predictor._preload = None
        tiny_predictor.set_image(image)
        ref = np.asarray(tiny_predictor._features)
        img2 = image.copy()
        tiny_predictor.preload_image(img2)
        assert tiny_predictor._preload is not None
        tiny_predictor.set_image(img2)
        assert tiny_predictor._preload is None  # consumed
        np.testing.assert_array_equal(np.asarray(tiny_predictor._features), ref)
        assert tiny_predictor._input_hw == (51, 64)
        # preloading the already-set image is a no-op
        tiny_predictor.preload_image(img2)
        assert tiny_predictor._preload is None

    def test_through_mask_generation(self, tiny_predictor):
        r = np.random.default_rng(1)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)

        def predict_fn(img, kps_norm):
            tiny_predictor.set_image(img)
            h2, w2 = tiny_predictor._input_hw
            dims = np.asarray([h2, w2], np.float32)
            rc = 0.5 * (dims - 1) * (np.asarray(kps_norm) + 1)
            masks, iou = tiny_predictor.predict_batched_points(
                np.round(rc[:, ::-1])
            )
            return np.asarray(masks), np.asarray(iou)

        cfg = load_config({"sam_params": {
            "stability_threshold": 0.0,   # random weights: keep everything
            "filter_edge_points": False,
        }})
        out = infer_masks(
            predict_fn, image, cfg.sam_params, num_pts=6, num_pts_active=3,
            rng=np.random.default_rng(2),
        )
        assert out["masks"].dtype == bool
        assert out["keypoints"].shape[0] == out["masks"].shape[0]
        assert out["edges"].shape == image.shape[:2]


class TestDeviceSelectPath:
    def test_select_matches_host_selection(self, tiny_predictor):
        """predict_points_select (on-device filter/pick/boxes + survivor-only
        transfer) must reproduce the host smallest_good_mask_batch + nms
        exactly, for several threshold settings."""
        from super_primitive_tpu.frontend.mask_generation import (
            nms,
            smallest_good_mask_batch,
        )

        r = np.random.default_rng(7)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)
        tiny_predictor.set_image(image)
        pts = (r.random((9, 2)) * np.asarray([60.0, 44.0])).round()
        out = tiny_predictor.target_length

        masks_b, iou, stab, area = tiny_predictor.predict_points_with_stats(
            pts, out_size=out, chunk=4
        )
        for iou_thr, stab_thr in ((0.0, 0.0), (0.0, 0.5), (0.8, 0.4)):
            sel_host = smallest_good_mask_batch(
                masks_b, iou, iou_threshold=iou_thr,
                stability_score_thresh=stab_thr,
                select_smallest=True, stability=stab, areas=area,
            )
            boxes = sel_host["boxes"]
            a = np.prod(boxes[:, 2:] - boxes[:, :2], axis=-1)
            keep = nms(boxes, 1.0 / np.maximum(a, 1e-9), 0.8)
            want = {k: v[keep] for k, v in sel_host.items()}

            got = tiny_predictor.predict_points_select(
                pts, iou_threshold=iou_thr, stability_threshold=stab_thr,
                nms_enabled=True, box_nms_thresh=0.8,
                filter_by_box_size=True, out_size=out, chunk=4,
            )
            np.testing.assert_array_equal(
                got["keypoints_ids"], want["keypoints_ids"], err_msg=str((iou_thr, stab_thr))
            )
            np.testing.assert_array_equal(got["masks_ids"], want["masks_ids"])
            np.testing.assert_allclose(got["iou_preds"], want["iou_preds"], atol=1e-6)
            np.testing.assert_array_equal(got["boxes"], want["boxes"])
            np.testing.assert_array_equal(got["masks"], want["masks"])

    def test_select_through_infer_masks(self, tiny_predictor):
        """The select_round protocol drives the full two-round generation."""
        r = np.random.default_rng(8)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)

        def predict_fn(img, kps_norm):  # stats path (not used when selecting)
            raise AssertionError("select_round should bypass this")

        def select_round(img, kps_norm, sam_params):
            tiny_predictor.set_image(img)
            h2, w2 = tiny_predictor._input_hw
            dims = np.asarray([h2, w2], np.float32)
            rc = 0.5 * (dims - 1) * (np.asarray(kps_norm) + 1)
            return tiny_predictor.predict_points_select(
                np.round(rc[:, ::-1]),
                iou_threshold=sam_params.iou_threshold,
                stability_threshold=sam_params.stability_threshold,
                nms_enabled=sam_params.nms,
                box_nms_thresh=sam_params.box_nms_thresh,
                filter_by_box_size=sam_params.filter_by_box_size,
                out_size=tiny_predictor.target_length, chunk=4,
            )

        predict_fn.select_round = select_round
        cfg = load_config({"sam_params": {
            "stability_threshold": 0.0, "filter_edge_points": False,
        }})
        got = infer_masks(
            predict_fn, image, cfg.sam_params, num_pts=6, num_pts_active=3,
            rng=np.random.default_rng(2),
        )
        assert got["masks"].dtype == bool
        assert got["keypoints"].shape[0] == got["masks"].shape[0]
        assert got["masks"].shape[0] > 0


def _tiny_select_kwargs(sam_params, predictor):
    return dict(
        iou_threshold=sam_params.iou_threshold,
        stability_threshold=sam_params.stability_threshold,
        nms_enabled=sam_params.nms,
        box_nms_thresh=sam_params.box_nms_thresh,
        filter_by_box_size=sam_params.filter_by_box_size,
        out_size=predictor.target_length,
    )


def _make_select_fns(tiny_predictor, two_phase: bool):
    """mask_generation predict_fn with select_round; optionally the
    two-phase dispatch/finish protocol that enables the deferred path."""

    def _xy(img, kps_norm):
        tiny_predictor.set_image(img)
        h2, w2 = tiny_predictor._input_hw
        dims = np.asarray([h2, w2], np.float32)
        rc = 0.5 * (dims - 1) * (np.asarray(kps_norm) + 1)
        return np.round(rc[:, ::-1])

    def predict_fn(img, kps_norm):
        raise AssertionError("select_round should bypass this")

    def select_round(img, kps_norm, sam_params):
        return tiny_predictor.predict_points_select(
            _xy(img, kps_norm), chunk=4,
            **_tiny_select_kwargs(sam_params, tiny_predictor),
        )

    if two_phase:
        def dispatch(img, kps_norm, sam_params):
            return tiny_predictor.select_dispatch(
                _xy(img, kps_norm),
                iou_threshold=sam_params.iou_threshold,
                stability_threshold=sam_params.stability_threshold,
                out_size=tiny_predictor.target_length, chunk=4,
            )

        def finish(handle, sam_params, defer_masks=False):
            return tiny_predictor.select_finish(
                handle, nms_enabled=sam_params.nms,
                box_nms_thresh=sam_params.box_nms_thresh,
                filter_by_box_size=sam_params.filter_by_box_size,
                defer_masks=defer_masks,
            )

        select_round.dispatch = dispatch
        select_round.finish = finish
    predict_fn.select_round = select_round
    return predict_fn


class TestDeviceNms:
    def test_device_nms_matches_host_path(self, tiny_predictor):
        """Single-chunk dispatch chains greedy NMS + coverage on device
        (predictor._select_nms_device); results — kept set, keep ORDER,
        masks, and the pre-fetched coverage plane — must equal the host-NMS
        multi-chunk path exactly, for both scoring modes."""
        r = np.random.default_rng(13)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)
        tiny_predictor.set_image(image)
        pts = (r.random((9, 2)) * np.asarray([60.0, 44.0])).round()
        out = tiny_predictor.target_length

        for by_size in (True, False):
            want = tiny_predictor.predict_points_select(
                pts, iou_threshold=0.0, stability_threshold=0.0,
                nms_enabled=True, box_nms_thresh=0.5,
                filter_by_box_size=by_size, out_size=out, chunk=4,  # host NMS
            )
            h = tiny_predictor.select_dispatch(
                pts, iou_threshold=0.0, stability_threshold=0.0,
                out_size=out, nms_enabled=True, box_nms_thresh=0.5,
                filter_by_box_size=by_size,  # chunk=None: single chunk
            )
            assert "nms" in h, "single-chunk dispatch should chain device NMS"
            got = tiny_predictor.select_finish(
                h, nms_enabled=True, box_nms_thresh=0.5,
                filter_by_box_size=by_size, defer_masks=True,
            )
            d = got.pop("deferred")
            cov = got.pop("coverage")
            np.testing.assert_array_equal(
                got["keypoints_ids"], want["keypoints_ids"], err_msg=f"by_size={by_size}"
            )
            np.testing.assert_array_equal(got["masks_ids"], want["masks_ids"])
            np.testing.assert_array_equal(got["boxes"], want["boxes"])
            np.testing.assert_array_equal(d.fetch(), want["masks"])
            np.testing.assert_array_equal(cov, want["masks"].any(axis=0))
            np.testing.assert_array_equal(cov, d.coverage())


class TestDeferredMasks:
    def test_deferred_products_match_eager(self, tiny_predictor):
        """defer_masks=True must reproduce the eager selection exactly:
        host fetch, device coverage, device nearest-resize (vs the cv2
        resize the legacy BiNI path uses), and box-derived resized bbox
        sizes (vs pixel-true bboxes)."""
        from super_primitive_tpu.frontend.process_frame import _nn_resize
        from super_primitive_tpu.integrate.bini import segment_bbox_sizes

        r = np.random.default_rng(11)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)
        tiny_predictor.set_image(image)
        pts = (r.random((9, 2)) * np.asarray([60.0, 44.0])).round()
        out = tiny_predictor.target_length

        eager = tiny_predictor.predict_points_select(
            pts, stability_threshold=0.0, out_size=out, chunk=4
        )
        h = tiny_predictor.select_dispatch(
            pts, iou_threshold=0.0, stability_threshold=0.0,
            out_size=out, chunk=4,
        )
        got = tiny_predictor.select_finish(h, defer_masks=True)
        d = got.pop("deferred")
        assert got["masks"] is None
        np.testing.assert_array_equal(got["keypoints_ids"], eager["keypoints_ids"])
        np.testing.assert_array_equal(d.coverage(), eager["masks"].any(axis=0))
        np.testing.assert_array_equal(d.fetch(), eager["masks"])

        # device nearest-resize == cv2 INTER_NEAREST, several up-shapes
        for Hg, Wg in ((d.hs, d.ws), (53, 71), (96, 128)):
            rows = np.arange(d.n_rows)
            dev = np.asarray(d.device_masks_resized(rows, d.n_rows + 3, Hg, Wg))
            host = _nn_resize(eager["masks"], (Hg, Wg)).astype(bool)
            np.testing.assert_array_equal(dev[: d.n_rows], host)
            assert not dev[d.n_rows:].any()  # bucket padding zeroed

            hs_r, ws_r = d.resized_bbox_sizes(Hg, Wg)
            hs_t, ws_t = segment_bbox_sizes(host)
            np.testing.assert_array_equal(hs_r, hs_t)
            np.testing.assert_array_equal(ws_r, ws_t)

        # subset gather (crop/full routing order)
        idx = np.arange(0, d.n_rows, 2)
        if idx.size:
            sub = np.asarray(d.device_masks_resized(idx, idx.size, 53, 71))
            host = _nn_resize(eager["masks"][idx], (53, 71)).astype(bool)
            np.testing.assert_array_equal(sub, host)

    def test_infer_masks_deferred_matches_legacy(self, tiny_predictor):
        """The deferred two-phase flow through infer_masks must produce the
        identical generation output (identical coverage -> identical active
        resampling draws -> identical rounds)."""
        cfg = load_config({"sam_params": {
            "stability_threshold": 0.0, "filter_edge_points": False,
        }})
        r = np.random.default_rng(12)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)

        outs = []
        for two_phase in (False, True):
            pf = _make_select_fns(tiny_predictor, two_phase)
            outs.append(infer_masks(
                pf, image, cfg.sam_params, num_pts=6, num_pts_active=3,
                rng=np.random.default_rng(2),
            ))
        a, b = outs
        np.testing.assert_array_equal(a["masks"], b["masks"])
        np.testing.assert_array_equal(a["keypoints"], b["keypoints"])
        np.testing.assert_array_equal(a["src_round"], b["src_round"])
        np.testing.assert_array_equal(a["src_idx"], b["src_idx"])
        np.testing.assert_allclose(a["edges"], b["edges"], atol=0)
        np.testing.assert_array_equal(a["final_coverage"], b["final_coverage"])

    def test_frontprocessor_deferred_exact_keyframe(self, tiny_predictor):
        """FrontProcessor with the two-phase protocol (deferred masks +
        device-side BiNI mask resize + overlap) produces EXACTLY the
        legacy-path keyframe."""
        import jax.numpy as jnp

        from super_primitive_tpu.frontend.process_frame import FrontProcessor

        cfg = load_config({
            "frontend": {
                "downsample_pow": 1,
                "normals": {"integration_shape": [51, 64],
                            "network_dim": [96, 128]},
                "cg_max_iter": 100, "cg_tol": 1e-4,
                "check_for_depth_disc": False,
            },
            "sam_params": {
                "infer_resolution": [48, 60],
                "stability_threshold": 0.0,
                "filter_edge_points": False,
            },
        })

        def normals_fn(img01):
            n = np.zeros((51, 64, 3), np.float32)
            n[..., 2] = -1.0
            n[..., 0] = 0.05
            n /= np.linalg.norm(n, axis=-1, keepdims=True)
            return jnp.asarray(n), np.ones((51, 64, 1), np.float32)

        image = (np.random.default_rng(0).uniform(0, 255, (96, 120, 3))).astype(np.uint8)
        K = np.array([[100.0, 0, 60], [0, 100.0, 48], [0, 0, 1.0]])

        kfs = []
        for two_phase in (True, False):
            pf = _make_select_fns(tiny_predictor, two_phase)
            fp = FrontProcessor(cfg, normals_fn, pf,
                                rng=np.random.default_rng(7))
            kfs.append(fp.process_to_kf(image, K))
        a, b = kfs
        np.testing.assert_array_equal(a["regions"], b["regions"])
        np.testing.assert_array_equal(a["keypoints_rc"], b["keypoints_rc"])
        np.testing.assert_allclose(
            a["logdepth_perseg"], b["logdepth_perseg"], atol=1e-6
        )


class TestPhaseUpsampleCounts:
    def test_exact_vs_materialized_resize(self):
        """Phase-decomposed stability/area counting must equal counting on
        the materialized bilinear upsample (the former 1.6 GB/chunk path)."""
        from super_primitive_tpu.nets.sam.predictor import (
            MASK_THRESHOLD,
            _phase_upsample_counts,
        )

        r = np.random.default_rng(9)
        S, s = 24, 4
        x = jnp.asarray(r.normal(size=(5, S, S)).astype(np.float32))
        input_hw = jnp.asarray([s * S - 7, s * S - 13])

        stab, area = _phase_upsample_counts(x, s, input_hw)

        up = jax.image.resize(x[..., None], (5, s * S, s * S, 1), "bilinear")[..., 0]
        row_ok = jnp.arange(s * S) < input_hw[0]
        col_ok = jnp.arange(s * S) < input_hw[1]
        reg = row_ok[:, None] & col_ok[None, :]
        hi = jnp.sum((up > MASK_THRESHOLD + 1.0) & reg, axis=(1, 2))
        lo = jnp.sum((up > MASK_THRESHOLD - 1.0) & reg, axis=(1, 2))
        ref_stab = hi / jnp.maximum(lo, 1)
        ref_area = jnp.sum((up > MASK_THRESHOLD) & reg, axis=(1, 2))

        np.testing.assert_array_equal(np.asarray(area), np.asarray(ref_area))
        np.testing.assert_allclose(np.asarray(stab), np.asarray(ref_stab), atol=2e-3)

    def test_pallas_kernel_matches_jnp(self):
        """The fused Pallas phase-count kernel (one VMEM pass, TPU select
        round) must reproduce the jnp reference exactly — counts are
        integer-valued, so no float-assoc tolerance is needed."""
        from super_primitive_tpu.nets.sam.predictor import (
            _phase_upsample_counts,
        )
        from super_primitive_tpu.ops.pallas_phase_counts import (
            phase_counts_pallas,
        )

        r = np.random.default_rng(11)
        S, s = 128, 4  # production-gated slab size (S % 128 == 0)
        x = jnp.asarray(r.normal(size=(3, S, S)).astype(np.float32))
        input_hw = jnp.asarray([s * S - 9, s * S - 21])

        ref_stab, ref_area = _phase_upsample_counts(x, s, input_hw)
        hi, lo, area = phase_counts_pallas(x, s, input_hw, interpret=True)
        stab = hi / np.maximum(np.asarray(lo), 1.0)
        np.testing.assert_array_equal(np.asarray(area), np.asarray(ref_area))
        np.testing.assert_allclose(
            np.asarray(stab), np.asarray(ref_stab), atol=1e-6
        )

    def test_packbits_roundtrip(self):
        from super_primitive_tpu.nets.sam.predictor import _packbits_lastaxis

        r = np.random.default_rng(3)
        m = r.uniform(size=(4, 3, 16, 32)) > 0.5
        packed = np.asarray(_packbits_lastaxis(jnp.asarray(m)))
        bits = np.unpackbits(packed, axis=-1).astype(bool)
        np.testing.assert_array_equal(bits, m)


class TestCoarseEdgeParity:
    """Coarse-edge path vs a torch oracle of the reference's
    mask_generation.py:234-252 (nearest mask downsample -> reflect-Scharr
    edges -> bilinear align_corners=True upsample)."""

    @staticmethod
    def _torch_oracle(masks, edge_shape):
        import torch
        import torch.nn.functional as F

        kx = (1.0 / 32.0) * torch.tensor(
            [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]]
        ).view(1, 1, 3, 3)
        ky = kx.transpose(-1, -2).clone()

        def masks_to_edges(m):
            f = torch.as_tensor(m, dtype=torch.float32)[:, None]
            fp = F.pad(f, (1, 1, 1, 1), mode="reflect")
            gx = F.conv2d(fp, kx)[:, 0]
            gy = F.conv2d(fp, ky)[:, 0]
            return torch.sqrt(gx**2 + gy**2).max(dim=0)[0]

        H, W = masks.shape[-2:]
        mt = torch.as_tensor(masks)
        mc = F.interpolate(
            mt.float()[:, None], size=edge_shape, mode="nearest"
        )[:, 0] > 0.5
        edges_c = masks_to_edges(mc)
        probs_c = (1 - 2 * edges_c).clip(0, 1)
        up = lambda x: F.interpolate(
            x[None, None], size=(H, W), mode="bilinear", align_corners=True
        )[0, 0]
        return (
            up(edges_c).numpy(), up(probs_c).numpy(),
            edges_c.numpy(), probs_c.numpy(),
        )

    def test_matches_torch_oracle(self):
        from super_primitive_tpu.frontend.mask_generation import (
            infer_edge_probs_coarse,
        )

        r = np.random.default_rng(3)
        # blob-like masks at working resolution (odd sizes stress the
        # nearest/bilinear index math)
        H, W = 53, 71
        masks = np.zeros((5, H, W), bool)
        for i in range(5):
            r0, c0 = r.integers(0, H - 12), r.integers(0, W - 16)
            masks[i, r0 : r0 + 12, c0 : c0 + 16] = True
        edge_shape = (27, 36)

        e, p, ec, pc = infer_edge_probs_coarse(masks, edge_shape)
        te, tp, tec, tpc = self._torch_oracle(masks, edge_shape)
        np.testing.assert_allclose(ec, tec, atol=1e-6)
        np.testing.assert_allclose(pc, tpc, atol=1e-6)
        np.testing.assert_allclose(e, te, atol=1e-5)
        np.testing.assert_allclose(p, tp, atol=1e-5)

    def test_infer_masks_returns_coarse_keys(self, tiny_predictor):
        r = np.random.default_rng(7)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)

        def predict_fn(img, kps_norm):
            tiny_predictor.set_image(img)
            h2, w2 = tiny_predictor._input_hw
            dims = np.asarray([h2, w2], np.float32)
            rc = 0.5 * (dims - 1) * (np.asarray(kps_norm) + 1)
            masks, iou = tiny_predictor.predict_batched_points(np.round(rc[:, ::-1]))
            return np.asarray(masks), np.asarray(iou)

        cfg = load_config({"sam_params": {
            "stability_threshold": 0.0, "filter_edge_points": False,
        }})
        out = infer_masks(
            predict_fn, image, cfg.sam_params, num_pts=6, num_pts_active=0,
            rng=np.random.default_rng(2), edge_probs_shape=(24, 30),
        )
        assert out["edge_coarse"].shape == (24, 30)
        assert out["edge_probs"].shape == image.shape[:2]


class TestStatsPathConsistency:
    def test_stats_match_logits_path(self, tiny_predictor):
        """The device fast path (predict_points_with_stats) must agree with
        the reference-style logits path on masks, stability and areas."""
        import numpy as np

        from super_primitive_tpu.frontend.mask_generation import (
            calculate_stability_score,
        )

        r = np.random.default_rng(5)
        image = r.integers(0, 255, (48, 60, 3), np.uint8)
        tiny_predictor.set_image(image)
        pts = np.asarray([[10.0, 20.0], [40.0, 30.0], [25.0, 12.0]])

        logits, iou_a = tiny_predictor.predict_batched_points(pts)
        masks_b, iou_b, stab_b, area_b = tiny_predictor.predict_points_with_stats(
            pts, out_size=tiny_predictor.target_length
        )
        np.testing.assert_allclose(iou_a, iou_b, atol=1e-5)
        # areas live on different grids (stats: model input region h2 x w2;
        # logits: original image) — only the ORDERING matters downstream
        # (smallest-mask selection); compare as fractional coverage
        area_a = (np.asarray(logits) > 0).sum(axis=(-2, -1))
        frac_a = area_a / (logits.shape[-2] * logits.shape[-1])
        h2, w2 = tiny_predictor._input_hw
        frac_b = area_b / (h2 * w2)
        rel = np.abs(frac_a - frac_b) / np.maximum(frac_a, 1e-9)
        assert rel.max() < 0.15, (frac_a, frac_b)
        # ordering preserved per keypoint
        np.testing.assert_array_equal(
            np.argsort(area_a, axis=1), np.argsort(area_b, axis=1)
        )
        stab_a = calculate_stability_score(np.asarray(logits), 0.0, 1.0)
        np.testing.assert_allclose(stab_a, stab_b, atol=0.15)
        # binary masks agree (both at original-aspect resolution here)
        m_a = np.asarray(logits) > 0
        import cv2

        agree = []
        for i in range(m_a.shape[0]):
            for j in range(3):
                mb = cv2.resize(
                    masks_b[i, j].astype(np.uint8),
                    (m_a.shape[3], m_a.shape[2]),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
                inter = (m_a[i, j] & mb).sum()
                union = max((m_a[i, j] | mb).sum(), 1)
                agree.append(inter / union)
        # random-weight logits are speckle; binarize-then-resize vs
        # resize-then-binarize disagree at speckle boundaries. Real masks
        # are smooth blobs (agreement ~1); 0.7 guards gross mismatches.
        assert np.mean(agree) > 0.7, np.mean(agree)
