"""SAM predictor: preprocessing + batched point-prompt mask prediction.

Equivalent of ``SamPredictor`` as used by the reference
(frontend/segment/sam_tools.py): resize longest side to ``target_length``,
ImageNet-ish pixel normalization, pad to square, encode once; then for
batched single-point prompts return multimask logits upscaled to the
original image resolution.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .image_encoder import ImageEncoderViT, ViTConfig, VIT_H
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder

PIXEL_MEAN = jnp.asarray([123.675, 116.28, 103.53])
PIXEL_STD = jnp.asarray([58.395, 57.12, 57.375])
MASK_THRESHOLD = 0.0


def get_preprocess_shape(h: int, w: int, target_length: int) -> tuple[int, int]:
    """Longest-side resize shape (SamPredictor.transform semantics)."""
    scale = target_length / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


class SamPredictor:
    """Holds params + jitted encode/decode; stateful per-image like the
    reference predictor."""

    def __init__(self, params: dict, cfg: ViTConfig = VIT_H):
        self.cfg = cfg
        self.params = params
        self.target_length = cfg.img_size
        self.embed_size = cfg.img_size // cfg.patch_size
        self.encoder = ImageEncoderViT(cfg)
        self.prompt_encoder = PromptEncoder(
            embed_dim=cfg.out_chans,
            image_embedding_size=(self.embed_size, self.embed_size),
            input_image_size=(cfg.img_size, cfg.img_size),
        )
        self.decoder = MaskDecoder(transformer_dim=cfg.out_chans)
        self._features = None
        self._input_hw = None
        self._orig_hw = None

        @jax.jit
        def _encode(params, img):
            return self.encoder.apply({"params": params["image_encoder"]}, img)

        @jax.jit
        def _decode(params, features, points, labels):
            sparse, dense = self.prompt_encoder.apply(
                {"params": params["prompt_encoder"]}, points, labels
            )
            image_pe = self.prompt_encoder.apply(
                {"params": params["prompt_encoder"]},
                method=PromptEncoder.get_dense_pe,
            )
            masks, iou = self.decoder.apply(
                {"params": params["mask_decoder"]}, features, image_pe, sparse, dense
            )
            return masks, iou

        @functools.partial(jax.jit, static_argnames=("out_size",))
        def _decode_stats(params, features, points, labels, input_hw, out_size):
            """Decode + device-side mask statistics.

            Stability score and pixel areas are computed at the model's full
            resolution (amg semantics, padding masked out); BINARY masks come
            back on a square ``out_size`` grid the caller crops by the input
            aspect — the host transfer is bool at working resolution instead
            of float logits at full resolution (~500x smaller).
            """
            lowres, iou = _decode(params, features, points, labels)
            lowres = lowres[:, 1:]
            iou = iou[:, 1:]
            B, M = lowres.shape[:2]
            x = lowres.reshape(B * M, *lowres.shape[2:])[..., None]
            x = jax.image.resize(
                x, (B * M, self.target_length, self.target_length, 1), "bilinear"
            )[..., 0]
            # statistics over the input region only (padding masked)
            row_ok = jnp.arange(self.target_length) < input_hw[0]
            col_ok = jnp.arange(self.target_length) < input_hw[1]
            region = row_ok[:, None] & col_ok[None, :]
            hi = jnp.sum((x > (MASK_THRESHOLD + 1.0)) & region, axis=(1, 2))
            lo = jnp.sum((x > (MASK_THRESHOLD - 1.0)) & region, axis=(1, 2))
            stability = hi / jnp.maximum(lo, 1)
            areas = jnp.sum((x > MASK_THRESHOLD) & region, axis=(1, 2))
            masks_bin = (
                jax.image.resize(
                    jnp.where(region, x, -1e4)[..., None],
                    (B * M, out_size, out_size, 1), "bilinear",
                )[..., 0]
                > MASK_THRESHOLD
            )
            return (
                masks_bin.reshape(B, M, out_size, out_size),
                iou,
                stability.reshape(B, M),
                areas.reshape(B, M),
            )

        self._encode = _encode
        self._decode = _decode
        self._decode_stats = _decode_stats

    # -------------------------------------------------------------- image
    def set_image(self, image_hwc_uint8: np.ndarray):
        """Resize longest side, normalize, pad to square, encode.

        Re-encoding is skipped when the same array object is set twice in a
        row (mask generation runs two prompt rounds on one image)."""
        if (
            self._features is not None
            and getattr(self, "_last_image", None) is image_hwc_uint8
        ):
            return
        # strong reference keeps the array alive, so the identity check can't
        # alias a recycled id() of a garbage-collected previous image
        self._last_image = image_hwc_uint8
        H, W = image_hwc_uint8.shape[:2]
        self._orig_hw = (H, W)
        h2, w2 = get_preprocess_shape(H, W, self.target_length)
        self._input_hw = (h2, w2)
        import cv2

        resized = cv2.resize(
            np.asarray(image_hwc_uint8), (w2, h2), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        x = (jnp.asarray(resized) - PIXEL_MEAN) / PIXEL_STD
        x = jnp.pad(
            x, ((0, self.target_length - h2), (0, self.target_length - w2), (0, 0))
        )
        self._features = self._encode(self.params, x[None])

    # ------------------------------------------------------------- predict
    def predict_batched_points(
        self, points_input_frame: np.ndarray, chunk: int = 64
    ):
        """Single positive point per prompt, batched.

        ``points_input_frame`` (B, 2) in (x, y) pixels of the RESIZED input
        frame (the reference converts its normalized keypoints to this frame
        itself, sam_tools.py:30-33).

        Prompts run in fixed-size chunks (padded to ``chunk``) so full-res
        logits never exceed chunk x 3 x H x W on device — 300 prompts at
        960x1280 would otherwise materialize 4.4 GB.

        Returns (masks (B, 3, H_orig, W_orig) float logits (numpy), iou).
        """
        assert self._features is not None, "call set_image first"
        pts_all = np.asarray(points_input_frame, np.float32)
        B = pts_all.shape[0]
        out_masks = []
        out_iou = []
        for lo in range(0, B, chunk):
            part = pts_all[lo : lo + chunk]
            n = part.shape[0]
            if n < chunk:  # pad to the static chunk size
                part = np.concatenate(
                    [part, np.zeros((chunk - n, 2), np.float32)], axis=0
                )
            pts = jnp.asarray(part)[:, None, :]
            # pad point (SAM appends one when no box): label -1
            pts = jnp.concatenate([pts, jnp.zeros_like(pts)], axis=1)
            labels = jnp.concatenate(
                [jnp.ones((chunk, 1)), -jnp.ones((chunk, 1))], axis=1
            )
            masks, iou = self._decode(self.params, self._features, pts, labels)
            # multimask: drop mask 0 (sam_tools uses multimask_output=True)
            masks = self.postprocess_masks(masks[:, 1:])
            out_masks.append(np.asarray(masks[:n]))
            out_iou.append(np.asarray(iou[:n, 1:]))
        return np.concatenate(out_masks), np.concatenate(out_iou)

    def predict_points_with_stats(
        self,
        points_input_frame: np.ndarray,
        out_size: int = 256,
        chunk: int = 128,
    ):
        """Device-side selection statistics variant (fast path).

        Returns (masks_bool (B, 3, h, w), iou (B, 3), stability (B, 3),
        areas (B, 3)) with (h, w) = the input aspect at ``out_size`` scale.
        Stability/areas are full-resolution quantities computed on device;
        only the small boolean masks cross the host boundary.
        """
        assert self._features is not None, "call set_image first"
        h2, w2 = self._input_hw
        hs = int(round(h2 * out_size / self.target_length))
        ws = int(round(w2 * out_size / self.target_length))
        pts_all = np.asarray(points_input_frame, np.float32)
        B = pts_all.shape[0]
        out = {"masks": [], "iou": [], "stab": [], "area": []}
        input_hw = jnp.asarray([h2, w2])
        for lo in range(0, B, chunk):
            part = pts_all[lo : lo + chunk]
            n = part.shape[0]
            if n < chunk:
                part = np.concatenate(
                    [part, np.zeros((chunk - n, 2), np.float32)], axis=0
                )
            pts = jnp.asarray(part)[:, None, :]
            pts = jnp.concatenate([pts, jnp.zeros_like(pts)], axis=1)
            labels = jnp.concatenate(
                [jnp.ones((chunk, 1)), -jnp.ones((chunk, 1))], axis=1
            )
            masks, iou, stab, area = self._decode_stats(
                self.params, self._features, pts, labels, input_hw, out_size
            )
            out["masks"].append(np.asarray(masks[:n, :, :hs, :ws]))
            out["iou"].append(np.asarray(iou[:n]))
            out["stab"].append(np.asarray(stab[:n]))
            out["area"].append(np.asarray(area[:n]))
        return (
            np.concatenate(out["masks"]), np.concatenate(out["iou"]),
            np.concatenate(out["stab"]), np.concatenate(out["area"]),
        )

    def postprocess_masks(self, lowres_masks: jax.Array) -> jax.Array:
        """Upscale lowres logits to model res, crop padding, resize to the
        original image (SamPredictor.postprocess semantics,
        align_corners=False bilinear)."""
        B, M = lowres_masks.shape[:2]
        x = lowres_masks.reshape(B * M, *lowres_masks.shape[2:])[..., None]
        x = jax.image.resize(
            x, (B * M, self.target_length, self.target_length, 1), "bilinear"
        )
        h2, w2 = self._input_hw
        x = x[:, :h2, :w2]
        H, W = self._orig_hw
        x = jax.image.resize(x, (B * M, H, W, 1), "bilinear")
        return x[..., 0].reshape(B, M, H, W)
