"""Tests: Flax SAM (tiny config), NNET/EfficientNet shapes, mask-generation
pipeline with fakes, full frontend end-to-end with synthetic models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_primitive_tpu.config import load_config
from super_primitive_tpu.frontend.mask_generation import (
    active_sample_pos,
    calculate_stability_score,
    infer_masks,
    mask_to_box,
    nms,
    smallest_good_mask_batch,
)
from super_primitive_tpu.frontend.process_frame import FrontProcessor
from super_primitive_tpu.nets.efficientnet import EfficientNetFeatures, round_channels
from super_primitive_tpu.nets.nnet import NNET, norm_normalize, resize_bilinear_ac
from super_primitive_tpu.nets.sam.image_encoder import (
    VIT_TINY_TEST,
    Attention,
    ImageEncoderViT,
)
from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder


class TestEfficientNet:
    def test_b5_channel_plan(self):
        # B5 widths: stem 48; stages 24/40/64/128/176/304/512
        assert round_channels(32, 1.6) == 48
        for base, want in [(16, 24), (24, 40), (40, 64), (80, 128),
                           (112, 176), (192, 304), (320, 512)]:
            assert round_channels(base, 1.6) == want

    def test_feature_shapes_small(self):
        # small spatial input (divisible by 32) with the real B5 config
        model = EfficientNetFeatures()
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        stages, head = model.apply(params, x)
        chans = [s.shape[-1] for s in stages]
        assert chans == [24, 40, 64, 128, 176, 304, 512]
        assert head.shape == (1, 2, 3, 2048)
        assert stages[0].shape[1:3] == (32, 48)   # 1/2
        assert stages[2].shape[1:3] == (8, 12)    # 1/8


class TestNNET:
    def test_output_shape_and_normalization(self):
        model = NNET()
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (1, 64, 96, 4)  # out_res1 = full input res
        n = np.asarray(out[..., :3])
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1), 1.0, atol=1e-5
        )
        assert np.all(np.asarray(out[..., 3]) > 0)  # kappa positive

    def test_coarse_hw_matches_host_nn_resize(self):
        """Device-side coarse subsample == the host _nn_resize it replaces
        (integer ratios, the reference config's case)."""
        from super_primitive_tpu.frontend.process_frame import _nn_resize
        from super_primitive_tpu.nets.nnet import predict_normals

        model = NNET()
        x0 = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x0)
        img = jnp.asarray(
            np.random.default_rng(2).uniform(0, 1, (128, 192, 3)).astype(np.float32)
        )
        n_full, k_full = predict_normals(params, img, network_dim=(64, 96))
        n_c, k_c = predict_normals(
            params, img, network_dim=(64, 96), coarse_hw=(32, 48)
        )
        np.testing.assert_allclose(
            np.asarray(n_c), _nn_resize(np.asarray(n_full), (32, 48)), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(k_c)[..., 0],
            _nn_resize(np.asarray(k_full)[..., 0], (32, 48)), atol=1e-6
        )

    def test_uint8_input_matches_float(self):
        """The uint8 upload path (device-side /255) must reproduce the
        float [0,1] path up to one f32 rounding (XLA lowers the division
        as a reciprocal multiply inside the fused graph: ~3e-6, far below
        the network's own precision)."""
        from super_primitive_tpu.nets.nnet import predict_normals

        model = NNET()
        x0 = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x0)
        img_u8 = np.random.default_rng(3).integers(
            0, 255, (128, 192, 3), np.uint8
        )
        img01 = img_u8.astype(np.float32) / 255.0
        n_f, k_f = predict_normals(params, jnp.asarray(img01), network_dim=(64, 96))
        n_u, k_u = predict_normals(params, jnp.asarray(img_u8), network_dim=(64, 96))
        np.testing.assert_allclose(np.asarray(n_u), np.asarray(n_f), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(k_u), np.asarray(k_f), rtol=1e-5, atol=1e-5
        )

    def test_resize_matches_torch_align_corners(self):
        import torch

        x = np.random.default_rng(0).normal(size=(1, 7, 9, 2)).astype(np.float32)
        ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), (13, 5)))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(13, 5),
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestApplyTokenwiseValid:
    """The skip-pad slicer must reproduce fn-on-everything at valid tokens
    and write fill (default zeros) at pads, for every remainder pattern."""

    @pytest.mark.parametrize("rh,rw", [(2, 0), (0, 1), (2, 1)])
    def test_matches_dense_apply(self, rh, rw):
        from super_primitive_tpu.nets.sam.image_encoder import (
            apply_tokenwise_valid,
        )

        ws, nwh, nww, B, C = 3, 2, 3, 2, 5
        r = np.random.default_rng(0)
        xw = jnp.asarray(r.normal(size=(B * nwh * nww, ws, ws, C)).astype(np.float32))
        fn = lambda t: 2.0 * t + 1.0  # affine: fill for a zero token is 1
        got = apply_tokenwise_valid(xw, (nwh, nww, rh, rw), fn)
        want = np.array(fn(xw))
        w6 = want.reshape(B, nwh, nww, ws, ws, C)
        if rh:
            w6[:, nwh - 1 :, :, rh:] = 0.0
        if rw:
            w6[:, :, nww - 1 :, :, rw:] = 0.0
        np.testing.assert_allclose(np.asarray(got), w6.reshape(want.shape))

        filled = apply_tokenwise_valid(
            xw, (nwh, nww, rh, rw), fn, fill=jnp.ones((C,))
        )
        f6 = np.array(fn(xw)).reshape(B, nwh, nww, ws, ws, C)
        if rh:
            f6[:, nwh - 1 :, :, rh:] = 1.0
        if rw:
            f6[:, :, nww - 1 :, :, rw:] = 1.0
        np.testing.assert_allclose(np.asarray(filled), f6.reshape(want.shape))


class TestSamTiny:
    def test_encoder_shapes(self):
        cfg = VIT_TINY_TEST
        enc = ImageEncoderViT(cfg)
        x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        S = cfg.img_size // cfg.patch_size
        assert out.shape == (1, S, S, cfg.out_chans)

    def test_persistent_windows_and_windowed_ext_parity(self):
        """Encoder lowering options must not change the math.  The config
        pads (grid 4x4, window 3 -> 6x6), so this exercises the pad
        re-zeroing of the persistent-window path and the ext lowering's
        handling of zero pad tokens."""
        import dataclasses

        base = dataclasses.replace(
            VIT_TINY_TEST, depth=4, window_size=3, global_attn_indexes=(2,)
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (1, base.img_size, base.img_size, 3))
        enc0 = ImageEncoderViT(base)
        params = enc0.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
            params,
        )
        want = np.asarray(enc0.apply(params, x))
        for opts in (
            {"persistent_windows": True},
            {"windowed_attn_impl": "ext"},
            {"persistent_windows": True, "windowed_attn_impl": "ext"},
            {"persistent_windows": True, "skip_pad_compute": True},
            {
                "persistent_windows": True,
                "windowed_attn_impl": "ext",
                "skip_pad_compute": True,
            },
        ):
            cfg = dataclasses.replace(base, **opts)
            got = np.asarray(ImageEncoderViT(cfg).apply(params, x))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                       err_msg=str(opts))

    def test_global_attn_impl_parity(self):
        # "ext" folds rel-pos into the QK contraction (extended heads); the
        # scores must match the materialized-bias "xla" path exactly.
        # Non-square spatial input catches row/col onehot transpositions.
        H, W, C, nh = 4, 6, 16, 2
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, (2, H, W, C))
        ref = Attention(nh, input_size=(H, W), impl="xla")
        params = ref.init(rng, x)
        # give rel-pos tables non-zero values (init is zeros)
        params = jax.tree.map(
            lambda a: a + 0.1 * jax.random.normal(rng, a.shape), params
        )
        out_xla = ref.apply(params, x)
        for impl in ("ext", "ext_hp"):
            out = Attention(nh, input_size=(H, W), impl=impl).apply(params, x)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(out_xla), rtol=1e-5, atol=1e-5,
                err_msg=impl,
            )

    def test_decoder_shapes(self):
        D = 16
        dec = MaskDecoder(transformer_dim=D)
        feats = jnp.zeros((1, 4, 4, D))
        pe = jnp.zeros((1, 4, 4, D))
        sparse = jnp.zeros((5, 2, D))
        dense = jnp.zeros((5, 4, 4, D))
        params = dec.init(jax.random.PRNGKey(1), feats, pe, sparse, dense)
        masks, iou = dec.apply(params, feats, pe, sparse, dense)
        assert masks.shape == (5, 4, 16, 16)
        assert iou.shape == (5, 4)

    def test_prompt_encoder(self):
        pe = PromptEncoder(embed_dim=16, image_embedding_size=(4, 4),
                           input_image_size=(64, 64))
        pts = jnp.asarray([[[10.0, 20.0], [0.0, 0.0]]])
        labels = jnp.asarray([[1.0, -1.0]])
        params = pe.init(jax.random.PRNGKey(2), pts, labels)
        sparse, dense = pe.apply(params, pts, labels)
        assert sparse.shape == (1, 2, 16)
        assert dense.shape == (1, 4, 4, 16)
        grid_pe = pe.apply(params, method=PromptEncoder.get_dense_pe)
        assert grid_pe.shape == (1, 4, 4, 16)


def fake_predict_fn(image, kps_norm, size=20):
    """Rect masks around each keypoint: candidate sizes (s, 2s, 3s);
    iou favors the middle one."""
    H, W = image.shape[:2]
    B = kps_norm.shape[0]
    dims = np.asarray([H, W], np.float32)
    kp_px = np.round(0.5 * (dims - 1) * (kps_norm + 1)).astype(int)
    logits = np.full((B, 3, H, W), -10.0, np.float32)
    for i, (r, c) in enumerate(kp_px):
        for j, s in enumerate((size, 2 * size, 3 * size)):
            r0, r1 = max(0, r - s // 2), min(H, r + s // 2 + 1)
            c0, c1 = max(0, c - s // 2), min(W, c + s // 2 + 1)
            logits[i, j, r0:r1, c0:c1] = 10.0
    iou = np.tile(np.asarray([[0.8, 0.95, 0.9]], np.float32), (B, 1))
    return logits, iou


class TestMaskGeneration:
    def test_stability_score(self):
        logits = np.full((1, 8, 8), -5.0, np.float32)
        logits[0, 2:6, 2:6] = 5.0
        s = calculate_stability_score(logits, 0.0, 1.0)
        np.testing.assert_allclose(s, 1.0)  # sharp mask: stable
        soft = np.zeros((1, 8, 8), np.float32)
        soft[0, 2:6, 2:6] = 0.5  # between thresholds
        s2 = calculate_stability_score(soft, 0.0, 1.0)
        assert s2[0] < 0.5

    def test_mask_to_box(self):
        m = np.zeros((2, 10, 12), bool)
        m[0, 2:5, 3:8] = True
        boxes = mask_to_box(m)
        np.testing.assert_array_equal(boxes[0], [3, 2, 8, 5])
        np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])

    def test_nms_suppresses_overlaps(self):
        boxes = np.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32
        )
        keep = nms(boxes, np.asarray([0.9, 0.8, 0.7]), 0.5)
        np.testing.assert_array_equal(sorted(keep), [0, 2])

    def test_smallest_good_selection(self):
        logits, iou = fake_predict_fn(np.zeros((64, 64, 3)), np.zeros((2, 2)), size=8)
        sel = smallest_good_mask_batch(logits, iou, 0.0, 0.5, select_smallest=True)
        # smallest good candidate (index 0) picked
        np.testing.assert_array_equal(sel["masks_ids"], [0, 0])
        assert sel["masks"].shape[0] == 2

    def test_active_sampling_targets_uncovered(self):
        cov = np.zeros((64, 64), bool)
        cov[:, :32] = True  # left half covered
        rng = np.random.default_rng(0)
        kps = active_sample_pos(cov, 50, rng)
        # samples concentrate on the uncovered right half (col norm > 0)
        frac_right = (kps[:, 1] > 0).mean()
        assert frac_right > 0.8

    def test_full_infer_masks(self):
        cfg = load_config({})
        rng = np.random.default_rng(3)
        out = infer_masks(
            fake_predict_fn, np.zeros((96, 128, 3), np.uint8), cfg.sam_params,
            num_pts=20, num_pts_active=10, rng=rng,
        )
        M = out["masks"].shape[0]
        assert M > 0 and out["keypoints"].shape == (M, 2)
        # keypoints on their masks (filter_edge_points=True)
        dims = np.asarray([96, 128], np.float32)
        kp_px = np.round(0.5 * (dims - 1) * (out["keypoints"] + 1)).astype(int)
        for i in range(M):
            assert out["masks"][i, kp_px[i, 0], kp_px[i, 1]]


class TestFrontProcessor:
    def test_end_to_end_plane(self):
        """Synthetic fronto-parallel plane: constant normals integrate to
        constant depth; KF dict consistent."""
        cfg = load_config({
            "frontend": {
                "downsample_pow": 1,
                "normals": {"integration_shape": [48, 64],
                            "network_dim": [96, 128]},
                "cg_max_iter": 200, "cg_tol": 1e-4,
                "check_for_depth_disc": False,
            },
            "sam_params": {"infer_resolution": [96, 128]},
        })

        def normals_fn(img01):
            H, W = img01.shape[:2]
            n = np.zeros((H, W, 3), np.float32)
            n[..., 2] = -1.0
            return n, np.ones((H, W, 1), np.float32)

        fp = FrontProcessor(cfg, normals_fn, fake_predict_fn,
                            rng=np.random.default_rng(7))
        image = (np.random.default_rng(0).uniform(0, 255, (96, 128, 3))).astype(np.uint8)
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1.0]])
        kf = fp.process_to_kf(image, K)

        assert kf["image"].shape == (48, 64, 3)
        N = kf["regions"].shape[0]
        assert N > 0
        assert kf["logdepth_perseg"].shape == kf["regions"].shape
        assert np.all(np.isfinite(kf["logdepth_perseg"]))
        # fronto-parallel normals -> constant per-segment logdepth (gauge 0)
        for i in range(N):
            vals = kf["logdepth_perseg"][i][kf["regions"][i]]
            assert vals.std() < 1e-3, (i, vals.std())
        # keypoints inside their regions
        for i in range(N):
            r, c = kf["keypoints_rc"][i]
            assert kf["regions"][i, r, c]

    def test_supp_kf(self):
        cfg = load_config({"frontend": {"downsample_pow": 2}})
        fp = FrontProcessor(cfg, None, None)
        img = np.zeros((96, 128, 3), np.uint8)
        K = np.eye(3)
        out = fp.process_to_supp_kf(img, K)
        assert out["image"].shape == (24, 32, 3)
        np.testing.assert_allclose(out["K"][0, 0], 0.25, atol=1e-9)

    def test_overlap_path_matches_legacy(self):
        """BiNI-overlap dispatch path (round-1 integration during SAM round
        2) produces EXACTLY the legacy single-dispatch keyframe — contents
        are per-segment; only the scheduling differs."""
        cfg = load_config({
            "frontend": {
                "downsample_pow": 1,
                "normals": {"integration_shape": [48, 64],
                            "network_dim": [96, 128]},
                "cg_max_iter": 200, "cg_tol": 1e-4,
                "check_for_depth_disc": False,
            },
            "sam_params": {"infer_resolution": [96, 128]},
        })

        def normals_fn(img01):
            # at the INTEGRATION shape, like the real predict_normals with
            # coarse_hw set — enables the overlap path
            n = np.zeros((48, 64, 3), np.float32)
            n[..., 2] = -1.0
            n[..., 0] = 0.05
            n /= np.linalg.norm(n, axis=-1, keepdims=True)
            return jnp.asarray(n), np.ones((48, 64, 1), np.float32)

        image = (np.random.default_rng(0).uniform(0, 255, (96, 128, 3))).astype(np.uint8)
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1.0]])

        kfs = []
        for disable in (False, True):
            fp = FrontProcessor(cfg, normals_fn, fake_predict_fn,
                                rng=np.random.default_rng(7))
            fp.disable_overlap = disable
            kfs.append(fp.process_to_kf(image, K))
        a, b = kfs
        assert a["regions"].shape == b["regions"].shape
        np.testing.assert_array_equal(a["regions"], b["regions"])
        np.testing.assert_array_equal(a["keypoints_rc"], b["keypoints_rc"])
        np.testing.assert_allclose(
            a["logdepth_perseg"], b["logdepth_perseg"], atol=1e-6
        )
        np.testing.assert_allclose(a["image"], b["image"], atol=0)
