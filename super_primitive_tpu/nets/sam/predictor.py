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


def _phase_upsample_counts(x: jax.Array, s: int, input_hw: jax.Array):
    """(stability, areas) of thresholded bilinear s-upsampled logits without
    materializing the upsampled grid.

    For an integer upsample factor s with half-pixel convention, output pixel
    (s*i + ky, s*j + kx) interpolates a fixed 2x2 neighborhood of x with
    phase-constant weights; summing per-phase counts over all s*s phases
    reproduces jax.image.resize('bilinear')-then-count exactly (edge taps
    renormalize to the clamped pixel, matched by the clamped shifts here).
    Stability = amg IoU of the +-1-offset threshold masks; area = pixels
    above MASK_THRESHOLD — all within the unpadded input region.
    """
    S = x.shape[-1]
    xm_r = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    xp_r = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    idx = jnp.arange(S)
    hi = lo = area = 0
    for ky in range(s):
        f = (ky + 0.5) / s - 0.5
        ry = (1 + f) * x - f * xm_r if f < 0 else (1 - f) * x + f * xp_r
        rym = jnp.concatenate([ry[:, :, :1], ry[:, :, :-1]], axis=2)
        ryp = jnp.concatenate([ry[:, :, 1:], ry[:, :, -1:]], axis=2)
        rok = (s * idx + ky) < input_hw[0]
        for kx in range(s):
            g = (kx + 0.5) / s - 0.5
            v = (1 + g) * ry - g * rym if g < 0 else (1 - g) * ry + g * ryp
            cok = (s * idx + kx) < input_hw[1]
            reg = rok[:, None] & cok[None, :]
            hi = hi + jnp.sum((v > MASK_THRESHOLD + 1.0) & reg, axis=(1, 2))
            lo = lo + jnp.sum((v > MASK_THRESHOLD - 1.0) & reg, axis=(1, 2))
            area = area + jnp.sum((v > MASK_THRESHOLD) & reg, axis=(1, 2))
    return hi / jnp.maximum(lo, 1), area


def phase_upsample_counts(x: jax.Array, s: int, input_hw: jax.Array):
    """Dispatch for :func:`_phase_upsample_counts`: on TPU at production
    slab sizes, a fused Pallas kernel computes all s^2 phases in one VMEM
    pass per mask (the XLA lowering pays 3*s^2 full reductions over the
    (B*M, S, S) slab — ~32 ms of the select round's ~80 ms device time;
    ops/pallas_phase_counts.py).  Counts are integer-valued, so the two
    paths agree exactly (asserted in tests/test_sam_pipeline.py)."""
    S = x.shape[-1]
    if jax.default_backend() == "tpu" and S % 128 == 0:
        from ...ops.pallas_phase_counts import phase_counts_pallas

        hi, lo, area = phase_counts_pallas(x, s, input_hw)
        return hi / jnp.maximum(lo, 1.0), area
    return _phase_upsample_counts(x, s, input_hw)


def _packbits_lastaxis(masks: jax.Array) -> jax.Array:
    """(..., W) bool -> (..., W//8) uint8, MSB-first (np.unpackbits order)."""
    W = masks.shape[-1]
    assert W % 8 == 0, W
    b = masks.reshape(*masks.shape[:-1], W // 8, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint8)


@jax.jit
def _select_nms_device(packed, iou_pick, kp_valid, boxes, n_valid,
                       nms_thr, by_size):
    """Greedy box NMS + survivor coverage ON DEVICE (chained after
    ``_decode_select`` so the host's select_finish needs ONE sync instead of
    scalars-fetch -> host NMS -> gather -> coverage-fetch).

    Exactly ``frontend.mask_generation.nms`` (torchvision semantics —
    descending score, stable ties, suppress IoU > thr) restricted to the
    first ``n_valid`` rows with ``kp_valid`` set: scores are 1/max(box
    area, 1e-9) when ``by_size`` else the picked IoU prediction, all in f32
    from the same boxes, so host-side stable re-sorting of the kept flags
    reproduces the reference's keep ORDER (asserted in
    tests/test_sam_pipeline.py on the CPU/relay backends; XLA f32 divide is
    not guaranteed correctly rounded on every backend, so near-tied scores
    could in principle order differently on other chips — see the matching
    note in ``select_finish``).  Returns (kept (C,) bool, coverage
    (S, S//8) packed-uint8 OR of the kept masks).
    """
    C = boxes.shape[0]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    scores = jnp.where(by_size, 1.0 / jnp.maximum(area, 1e-9), iou_pick)
    valid = kp_valid & (jnp.arange(C) < n_valid)  # pad prompts never compete
    scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores, stable=True)
    tl = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    br = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    inter = jnp.prod(jnp.clip(br - tl, 0, None), axis=-1)
    ious = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(t, st):
        kept, sup = st
        i = order[t]
        ok = (~sup[i]) & valid[i]
        kept = kept.at[i].set(ok)
        sup = jnp.where(ok, sup | (ious[i] > nms_thr), sup)
        sup = sup.at[i].set(True)
        return kept, sup

    kept, _ = jax.lax.fori_loop(
        0, C, body, (jnp.zeros(C, bool), jnp.zeros(C, bool))
    )
    cov = jax.lax.reduce(
        jnp.where(kept[:, None, None], packed, jnp.uint8(0)),
        jnp.uint8(0), jax.lax.bitwise_or, (0,),
    )
    return kept, cov


@jax.jit
def _gather_rows_jit(packed: jax.Array, idx: jax.Array) -> jax.Array:
    return packed[idx]


def stats_from_lowres(lowres, iou, input_hw, out_size, target_length):
    """Device-side mask statistics from (B, M, S, S) lowres logits.

    The post-decode body of ``_decode_stats`` (stability + areas by phase
    decomposition of the bilinear upsample, bit-packed binary masks) shared
    between the real decoder and the structured device fake
    (frontend/fakes.py) so both exercise identical statistics code.
    """
    B, M = lowres.shape[:2]
    S = lowres.shape[-1]
    x = lowres.reshape(B * M, S, S)

    s = target_length // S
    stability, areas = phase_upsample_counts(x, s, input_hw)

    if out_size == S:
        xb = x
    else:
        xb = jax.image.resize(
            x[..., None], (B * M, out_size, out_size, 1), "bilinear"
        )[..., 0]
    # NOTE boundary tolerance (ADVICE r2): logits are not forced to
    # -inf in the padded region before this resize, so interpolated
    # pad values can reach the last valid out_size row/col and are
    # zeroed only by the half-pixel ``region`` test (<= at exact
    # boundaries).  For input sizes not divisible by
    # target_length/out_size the mask border at the image edge can
    # differ from the reference amg by one pixel — below the noise
    # the downstream NN-resizes introduce.
    scale = target_length / out_size
    row_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[0]
    col_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[1]
    region = row_ok[:, None] & col_ok[None, :]
    masks_bin = (xb > MASK_THRESHOLD) & region
    packed = _packbits_lastaxis(masks_bin)
    return (
        packed.reshape(B, M, out_size, out_size // 8),
        iou,
        stability.reshape(B, M),
        areas.reshape(B, M),
    )


def select_from_lowres(lowres, iou, input_hw, out_size, iou_thr, stab_thr,
                       target_length):
    """amg smallest-good selection from (B, M, S, S) lowres logits ON DEVICE.

    The post-decode body of ``_decode_select`` (mirrors
    frontend.mask_generation.smallest_good_mask_batch, reference
    mask_generation.py:13-95, for select_smallest=True): per-candidate
    IoU/stability filter with full-resolution statistics via phase
    decomposition, keypoint valid iff any good candidate, smallest good mask
    by full-res pixel area, bit-packed picked mask + xyxy boxes.  Shared
    between the real decoder and the structured device fake so the fake
    path exercises the production selection code.
    """
    B, M = lowres.shape[:2]
    S = lowres.shape[-1]
    s = target_length // S
    stability, areas = phase_upsample_counts(
        lowres.reshape(B * M, S, S), s, input_hw
    )
    stability = stability.reshape(B, M)
    areas = areas.reshape(B, M)

    good = jnp.ones((B, M), bool)
    good = jnp.where(iou_thr > 0, good & (iou > iou_thr), good)
    good = jnp.where(stab_thr > 0, good & (stability >= stab_thr), good)
    kp_valid = good.any(axis=1)
    sizes = jnp.where(good, areas.astype(jnp.float32), 1e6)
    pick = jnp.argmin(sizes, axis=1)
    ar = jnp.arange(B)
    picked = lowres[ar, pick]
    iou_pick = iou[ar, pick]

    if out_size == S:
        xb = picked
    else:
        xb = jax.image.resize(
            picked[..., None], (B, out_size, out_size, 1), "bilinear"
        )[..., 0]
    scale = target_length / out_size
    row_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[0]
    col_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[1]
    region = row_ok[:, None] & col_ok[None, :]
    masks_bin = (xb > MASK_THRESHOLD) & region
    packed = _packbits_lastaxis(masks_bin)

    # xyxy boxes on the out_size grid (amg batched_mask_to_box:
    # zeros for empty masks)
    any_r = masks_bin.any(axis=2)
    any_c = masks_bin.any(axis=1)
    nonempty = any_r.any(axis=1)

    def first_last(a):
        first = jnp.argmax(a, axis=1)
        last = a.shape[1] - 1 - jnp.argmax(a[:, ::-1], axis=1)
        return first, last

    r0, r1 = first_last(any_r)
    c0, c1 = first_last(any_c)
    boxes = jnp.stack([c0, r0, c1 + 1, r1 + 1], axis=1).astype(jnp.float32)
    boxes = jnp.where(nonempty[:, None], boxes, 0.0)
    return packed, iou_pick, kp_valid, boxes, pick


@jax.jit
def _or_packed_rows(packed_rows: jax.Array, nrows: jax.Array) -> jax.Array:
    """Bitwise-OR of the first ``nrows`` rows of (cap, S, S8) packed masks —
    the device side of coverage: survivors OR-reduce to one packed (S, S8)
    plane (~8 KB) instead of shipping every survivor mask to the host."""
    valid = (jnp.arange(packed_rows.shape[0]) < nrows)[:, None, None]
    x = jnp.where(valid, packed_rows, jnp.uint8(0))
    return jax.lax.reduce(x, jnp.uint8(0), jax.lax.bitwise_or, (0,))


@functools.partial(jax.jit, static_argnames=("hs", "ws", "Hg", "Wg"))
def _gather_unpack_resize(packed, perm, nvalid, hs, ws, Hg, Wg):
    """Gather survivor rows from (P, S, S8) packed masks, unpack the bits,
    and nearest-resize the (hs, ws) valid region to (Hg, Wg) — all on
    device.  Index formula floor(dst * src/dst_size) matches both cv2
    INTER_NEAREST and torch 'nearest' (asserted in tests/test_sam_pipeline).
    Rows >= nvalid (bucket padding) come out all-False, matching the
    frontend's _pad_bucket zero padding."""
    rows = packed[perm]  # (cap, S, S8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (rows[..., None] >> shifts) & jnp.uint8(1)
    cap, S = rows.shape[0], rows.shape[1]
    m = bits.reshape(cap, S, rows.shape[2] * 8)
    # host-side (static) cv2-exact double-precision index tables
    ri = np.minimum(np.floor(np.arange(Hg) * (hs / Hg)), hs - 1).astype(np.int32)
    ci = np.minimum(np.floor(np.arange(Wg) * (ws / Wg)), ws - 1).astype(np.int32)
    m = m[:, ri][:, :, ci].astype(bool)
    valid = (jnp.arange(cap) < nvalid)[:, None, None]
    return m & valid


class DeferredMasks:
    """Post-NMS survivor masks left bit-packed ON DEVICE.

    Produced by :meth:`SamPredictor.select_finish` with ``defer_masks=True``
    so the masks-stage host traffic leaves the critical path (NOTES r04
    opportunity #1):

    - :meth:`coverage` ships one OR-reduced packed plane (~S*S/8 bytes)
      for active keypoint resampling instead of every survivor mask;
    - :meth:`device_masks_resized` feeds BiNI integration-resolution masks
      with zero host round-trip (no ~10 MB bool re-upload);
    - :meth:`fetch` materializes the host masks later — e.g. while the
      NEXT round's decode executes, overlapping transfer with compute.

    Row order of every product matches the selection dict ("keypoints_ids"
    order), identical to the eager ``masks`` array.
    """

    def __init__(self, fetches, order_pos, n_rows, hs, ws, boxes=None):
        # fetches: [(lo, rows_np, got_dev (cap_i, S, S8))]
        self._fetches = fetches
        self._order_pos = order_pos  # global keypoint id -> output row
        self.n_rows = n_rows
        self.hs, self.ws = hs, ws
        self.boxes = boxes  # (n_rows, 4) xyxy on the (ws, hs) grid
        self._host = None
        self._concat = None
        # source position in the padded device concat for each output row
        self._src_pos = np.zeros(n_rows, np.int64)
        off = 0
        for lo, rows, got in fetches:
            for k, r in enumerate(rows):
                self._src_pos[order_pos[int(r) + lo]] = off + k
            off += got.shape[0]

    def _device_concat(self):
        if self._concat is None:
            gots = [got for _, _, got in self._fetches]
            self._concat = gots[0] if len(gots) == 1 else jnp.concatenate(gots)
        return self._concat

    def coverage(self) -> np.ndarray:
        """(hs, ws) bool any-mask coverage, OR-reduced on device."""
        if self.n_rows == 0:
            return np.zeros((self.hs, self.ws), bool)
        acc = None
        for _, rows, got in self._fetches:
            c = _or_packed_rows(got, jnp.int32(rows.size))
            acc = c if acc is None else jnp.bitwise_or(acc, c)
        cov = np.unpackbits(np.asarray(acc), axis=-1)
        return cov[: self.hs, : self.ws].astype(bool)

    def device_masks_resized(self, out_rows: np.ndarray, cap: int,
                             Hg: int, Wg: int) -> jax.Array:
        """(cap, Hg, Wg) device bool for output rows ``out_rows`` (bucket-
        padded to ``cap``; padding rows all-False)."""
        perm = np.zeros(cap, np.int32)
        perm[: out_rows.size] = self._src_pos[out_rows]
        return _gather_unpack_resize(
            self._device_concat(), jnp.asarray(perm), jnp.int32(out_rows.size),
            self.hs, self.ws, Hg, Wg,
        )

    def resized_bbox_sizes(self, Hg: int, Wg: int):
        """Per-row (h, w) bbox extents AFTER nearest-resize to (Hg, Wg),
        computed from the selection boxes without touching the masks.

        Exact when resizing up (Hg >= hs and Wg >= ws — the floor index map
        is then surjective, so the bbox-extreme source rows/cols are always
        sampled); callers must not rely on it for downsampling."""
        b = self.boxes
        ri = np.minimum(np.floor(np.arange(Hg) * (self.hs / Hg)), self.hs - 1)
        ci = np.minimum(np.floor(np.arange(Wg) * (self.ws / Wg)), self.ws - 1)
        h = np.searchsorted(ri, b[:, 3] - 1, "right") - np.searchsorted(ri, b[:, 1], "left")
        w = np.searchsorted(ci, b[:, 2] - 1, "right") - np.searchsorted(ci, b[:, 0], "left")
        return np.maximum(h, 0), np.maximum(w, 0)

    def fetch(self) -> np.ndarray:
        """Materialize (n_rows, hs, ws) host bool masks (cached)."""
        if self._host is None:
            masks = np.zeros((self.n_rows, self.hs, self.ws), bool)
            got_all = jax.device_get(
                [got[: rows.size] for _, rows, got in self._fetches]
            )
            for (lo, rows, _), got in zip(self._fetches, got_all):
                bits = np.unpackbits(got, axis=-1)
                bits = bits[:, : self.hs, : self.ws].astype(bool)
                for r, m in zip(rows, bits):
                    masks[self._order_pos[int(r) + lo]] = m
            self._host = masks
        return self._host


class SamPredictor:
    """Holds params + jitted encode/decode; stateful per-image like the
    reference predictor."""

    def __init__(self, params: dict, cfg: ViTConfig = VIT_H,
                 compute_dtype=None):
        """``compute_dtype``: optional reduced precision (jnp.bfloat16) for
        the image ENCODER only — the 4-TFLOP ViT-H forward runs on the MXU at
        full rate; features and the (small) decoder stay float32.  None keeps
        everything float32 (checkpoint-validation parity)."""
        if compute_dtype is not None and cfg.global_attn_impl == "xla":
            # perf path (chip A/B; ledger in examples/profile_encoder.py): extended-
            # head rel-pos for global AND windowed blocks + persistent
            # window layout = 108.7 ms vs 140.3 ms for the materialized-
            # bias / per-block-partition encoder at 1024^2 bf16.  Math
            # identical (parity-tested in tests/test_nets_frontend.py);
            # bf16 reassociation noise ~0.12 on feature scale 3.2.
            # gelu_approx shaves another ~16 ms (97.7 vs 113.4 ms,
            # examples/profile_encoder.py ledger); its deviation (~0.16 on scale
            # 3.2) is the same order as the bf16 noise already accepted on
            # this path.  The fp32 path (checkpoint validation) keeps the
            # exact erf GELU and materialized-bias attention.
            import dataclasses

            cfg = dataclasses.replace(
                cfg, global_attn_impl="ext", windowed_attn_impl="ext",
                persistent_windows=True, gelu_approx=True,
            )
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        if compute_dtype is not None:
            # pre-cast ONCE: a cast inside the jitted encode would re-read
            # the full 2.5 GB fp32 tree from HBM on every call and keep both
            # copies resident
            import jax.numpy as _jnp

            self._enc_params = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if a.dtype == _jnp.float32 else a,
                params["image_encoder"],
            )
        else:
            self._enc_params = params["image_encoder"]
        self.target_length = cfg.img_size
        self.embed_size = cfg.img_size // cfg.patch_size
        self.encoder = ImageEncoderViT(cfg)
        self.prompt_encoder = PromptEncoder(
            embed_dim=cfg.out_chans,
            image_embedding_size=(self.embed_size, self.embed_size),
            input_image_size=(cfg.img_size, cfg.img_size),
        )
        # tanh GELU in the decoder head on the reduced-precision path only
        # (exact erf kept for the f32 checkpoint-validation path, like the
        # encoder's gelu_approx)
        self.decoder = MaskDecoder(
            transformer_dim=cfg.out_chans,
            gelu_approx=compute_dtype is not None,
        )
        self._features = None
        self._input_hw = None
        self._orig_hw = None

        @jax.jit
        def _encode(enc_params, img):
            if self.compute_dtype is not None:
                img = img.astype(self.compute_dtype)
            feats = self.encoder.apply({"params": enc_params}, img)
            return feats.astype(jnp.float32)

        @jax.jit
        def _encode_u8(enc_params, img_u8):
            """uint8 (h2, w2, 3) -> normalize/pad/encode on device.

            The host uploads raw bytes (4x less relay/PCIe traffic than
            float32); normalization and square padding are device work."""
            x = (img_u8.astype(jnp.float32) - PIXEL_MEAN) / PIXEL_STD
            h2, w2 = img_u8.shape[:2]
            x = jnp.pad(
                x,
                ((0, self.target_length - h2), (0, self.target_length - w2), (0, 0)),
            )
            return _encode(enc_params, x[None]), x[None]

        @jax.jit
        def _decode(params, features, points, labels):
            sparse, dense = self.prompt_encoder.apply(
                {"params": params["prompt_encoder"]}, points, labels
            )
            image_pe = self.prompt_encoder.apply(
                {"params": params["prompt_encoder"]},
                method=PromptEncoder.get_dense_pe,
            )
            dec_p = params["mask_decoder"]
            if self.compute_dtype is not None:
                # two-way transformer + upscaling convs in bf16 (MXU-rate);
                # prompt embeddings and outputs stay float32
                cast = lambda a: a.astype(self.compute_dtype)
                dec_p = jax.tree.map(cast, dec_p)
                features, image_pe, sparse, dense = (
                    cast(features), cast(image_pe), cast(sparse), cast(dense)
                )
            masks, iou = self.decoder.apply(
                {"params": dec_p}, features, image_pe, sparse, dense
            )
            return masks.astype(jnp.float32), iou.astype(jnp.float32)

        @functools.partial(jax.jit, static_argnames=("out_size",))
        def _decode_stats(params, features, points, labels, input_hw, out_size):
            """Decode + device-side mask statistics, bandwidth-optimal.

            Stability score and pixel areas keep the model-full-resolution
            amg semantics, but are counted by PHASE DECOMPOSITION of the
            bilinear upsample (``_phase_upsample_counts``): per upsample
            phase the interpolant is an elementwise 2x2 combination of the
            low-res logits, so comparisons and region-masked sums fuse at
            low-res cost and the (B*M, 1024, 1024) intermediate — formerly
            ~1.6 GB of HBM traffic per 128-prompt chunk — never exists.

            Binary masks come back BIT-PACKED uint8 on a square ``out_size``
            grid (8x smaller host transfer than bool; ~64x smaller than the
            former float logits), padding region zeroed so the caller's
            aspect crop is exact.
            """
            lowres, iou = _decode(params, features, points, labels)
            lowres = lowres[:, 1:]
            iou = iou[:, 1:]
            B, M = lowres.shape[:2]
            S = lowres.shape[-1]
            x = lowres.reshape(B * M, S, S)

            s = self.target_length // S
            stability, areas = phase_upsample_counts(x, s, input_hw)

            if out_size == S:
                xb = x
            else:
                xb = jax.image.resize(
                    x[..., None], (B * M, out_size, out_size, 1), "bilinear"
                )[..., 0]
            # NOTE boundary tolerance (ADVICE r2): logits are not forced to
            # -inf in the padded region before this resize, so interpolated
            # pad values can reach the last valid out_size row/col and are
            # zeroed only by the half-pixel ``region`` test (<= at exact
            # boundaries).  For input sizes not divisible by
            # target_length/out_size the mask border at the image edge can
            # differ from the reference amg by one pixel — below the noise
            # the downstream NN-resizes introduce.
            scale = self.target_length / out_size
            row_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[0]
            col_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[1]
            region = row_ok[:, None] & col_ok[None, :]
            masks_bin = (xb > MASK_THRESHOLD) & region
            packed = _packbits_lastaxis(masks_bin)
            return (
                packed.reshape(B, M, out_size, out_size // 8),
                iou,
                stability.reshape(B, M),
                areas.reshape(B, M),
            )

        @functools.partial(jax.jit, static_argnames=("out_size",))
        def _decode_select(params, features, points, labels, input_hw,
                           out_size, iou_thr, stab_thr):
            """Decode + the amg smallest-good selection ON DEVICE.

            Mirrors frontend.mask_generation.smallest_good_mask_batch
            (reference mask_generation.py:13-95) for select_smallest=True:
            per-candidate IoU/stability filter (full-resolution stats via
            phase decomposition), keypoint valid iff any good candidate,
            pick the smallest good mask by full-res pixel area.  Returns the
            PICKED mask only (bit-packed, device-resident until the NMS
            survivors are known) plus the scalars the host needs for NMS —
            so only ~kept masks ever cross the relay (VERDICT r2 #2).
            """
            lowres, iou = _decode(params, features, points, labels)
            lowres = lowres[:, 1:]
            iou = iou[:, 1:]
            B, M = lowres.shape[:2]
            S = lowres.shape[-1]
            s = self.target_length // S
            stability, areas = phase_upsample_counts(
                lowres.reshape(B * M, S, S), s, input_hw
            )
            stability = stability.reshape(B, M)
            areas = areas.reshape(B, M)

            good = jnp.ones((B, M), bool)
            good = jnp.where(iou_thr > 0, good & (iou > iou_thr), good)
            good = jnp.where(stab_thr > 0, good & (stability >= stab_thr), good)
            kp_valid = good.any(axis=1)
            sizes = jnp.where(good, areas.astype(jnp.float32), 1e6)
            pick = jnp.argmin(sizes, axis=1)
            ar = jnp.arange(B)
            picked = lowres[ar, pick]
            iou_pick = iou[ar, pick]

            if out_size == S:
                xb = picked
            else:
                xb = jax.image.resize(
                    picked[..., None], (B, out_size, out_size, 1), "bilinear"
                )[..., 0]
            scale = self.target_length / out_size
            row_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[0]
            col_ok = (jnp.arange(out_size) + 0.5) * scale <= input_hw[1]
            region = row_ok[:, None] & col_ok[None, :]
            masks_bin = (xb > MASK_THRESHOLD) & region
            packed = _packbits_lastaxis(masks_bin)

            # xyxy boxes on the out_size grid (amg batched_mask_to_box:
            # zeros for empty masks)
            any_r = masks_bin.any(axis=2)
            any_c = masks_bin.any(axis=1)
            nonempty = any_r.any(axis=1)

            def first_last(a):
                first = jnp.argmax(a, axis=1)
                last = a.shape[1] - 1 - jnp.argmax(a[:, ::-1], axis=1)
                return first, last

            r0, r1 = first_last(any_r)
            c0, c1 = first_last(any_c)
            boxes = jnp.stack([c0, r0, c1 + 1, r1 + 1], axis=1).astype(jnp.float32)
            boxes = jnp.where(nonempty[:, None], boxes, 0.0)
            return packed, iou_pick, kp_valid, boxes, pick

        @jax.jit
        def _gather_rows(packed, idx):
            return packed[idx]

        self._encode = _encode
        self._encode_u8 = _encode_u8
        self._decode = _decode
        self._decode_stats = _decode_stats
        self._decode_select = _decode_select
        self._gather_rows = _gather_rows

    # -------------------------------------------------------------- image
    def preload_image(self, image_hwc_uint8: np.ndarray):
        """Resize + start the host->device upload WITHOUT encoding.

        device_put is asynchronous, so calling this while other device work
        is queued (the frontend calls it right after the NNET dispatch)
        hides the ~2.4 MB relay transfer that ``set_image`` would otherwise
        pay serially before the encoder dispatch.  The upload is cached by
        array identity; the subsequent ``set_image(same array)`` consumes
        it."""
        if getattr(self, "_last_image", None) is image_hwc_uint8 or (
            getattr(self, "_preload", None) is not None
            and self._preload[0] is image_hwc_uint8
        ):
            return
        H, W = image_hwc_uint8.shape[:2]
        h2, w2 = get_preprocess_shape(H, W, self.target_length)
        import cv2

        resized = cv2.resize(
            np.asarray(image_hwc_uint8), (w2, h2), interpolation=cv2.INTER_LINEAR
        )
        self._preload = (image_hwc_uint8, jax.device_put(resized), (h2, w2))

    def set_image(self, image_hwc_uint8: np.ndarray):
        """Resize longest side, normalize, pad to square, encode.

        Re-encoding is skipped when the same array object is set twice in a
        row (mask generation runs two prompt rounds on one image)."""
        if (
            self._features is not None
            and getattr(self, "_last_image", None) is image_hwc_uint8
        ):
            return
        H, W = image_hwc_uint8.shape[:2]
        pre = getattr(self, "_preload", None)
        if pre is not None and pre[0] is image_hwc_uint8:
            dev, (h2, w2) = pre[1], pre[2]
            self._preload = None
        else:
            # a stale preload of a DIFFERENT array must not linger: a later
            # in-place mutation of that host array could otherwise encode
            # stale pixels through the identity check (ADVICE r4)
            self._preload = None
            h2, w2 = get_preprocess_shape(H, W, self.target_length)
            import cv2

            dev = jnp.asarray(
                cv2.resize(
                    np.asarray(image_hwc_uint8), (w2, h2),
                    interpolation=cv2.INTER_LINEAR,
                )
            )
        self._features, self._preprocessed = self._encode_u8(
            self._enc_params, dev
        )
        # cache state only AFTER a successful encode: a transient encode
        # failure must not leave the predictor claiming the new image while
        # _features still holds the previous one.  The strong reference
        # keeps the array alive, so the identity check can't alias a
        # recycled id() of a garbage-collected previous image.
        self._last_image = image_hwc_uint8
        self._orig_hw = (H, W)
        self._input_hw = (h2, w2)

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
        input_hw = jnp.asarray([h2, w2])

        # dispatch ALL chunks first (async), fetch afterwards — chunk k+1
        # computes while chunk k's (small, bit-packed) results stream back
        pending = []
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
            pending.append(
                (n, self._decode_stats(
                    self.params, self._features, pts, labels, input_hw, out_size
                ))
            )
        out = {"masks": [], "iou": [], "stab": [], "area": []}
        fetched = jax.device_get(  # one batched fetch (see select path)
            [(packed[:n], iou[:n], stab[:n], area[:n])
             for n, (packed, iou, stab, area) in pending]
        )
        for packed, iou, stab, area in fetched:
            bits = np.unpackbits(packed, axis=-1)
            out["masks"].append(bits[:, :, :hs, :ws].astype(bool))
            out["iou"].append(iou)
            out["stab"].append(stab)
            out["area"].append(area)
        return (
            np.concatenate(out["masks"]), np.concatenate(out["iou"]),
            np.concatenate(out["stab"]), np.concatenate(out["area"]),
        )

    def predict_points_select(
        self,
        points_input_frame: np.ndarray,
        iou_threshold: float = 0.0,
        stability_threshold: float = 0.90,
        nms_enabled: bool = True,
        box_nms_thresh: float = 0.8,
        filter_by_box_size: bool = True,
        out_size: int = 256,
        chunk: Optional[int] = None,
    ) -> dict:
        """Full smallest-good selection round with survivor-only transfer.

        Device computes IoU/stability filtering, smallest-good pick, areas
        and boxes inside the decode dispatch; the host fetches only the
        per-keypoint scalars (iou/valid/box ~ 3 KB), runs box NMS, then
        gathers the ~kept bit-packed masks — several-fold less relay
        traffic than shipping all 3B candidate masks.  Equivalent to
        smallest_good_mask_batch + nms on the host
        (tests/test_sam_pipeline.py asserts equality).

        Returns the selection dict of mask_generation.run_round: masks
        (M, h, w) bool at working resolution, iou_preds, keypoints_ids
        (original prompt indices, NMS score order), boxes, masks_ids.
        """
        handle = self.select_dispatch(
            points_input_frame, iou_threshold, stability_threshold,
            out_size=out_size, chunk=chunk,
            nms_enabled=nms_enabled, box_nms_thresh=box_nms_thresh,
            filter_by_box_size=filter_by_box_size,
        )
        return self.select_finish(
            handle, nms_enabled=nms_enabled, box_nms_thresh=box_nms_thresh,
            filter_by_box_size=filter_by_box_size,
        )

    def select_dispatch(
        self,
        points_input_frame: np.ndarray,
        iou_threshold: float,
        stability_threshold: float,
        out_size: int = 256,
        chunk: Optional[int] = None,
        nms_enabled: bool = False,
        box_nms_thresh: float = 0.8,
        filter_by_box_size: bool = True,
    ) -> dict:
        """Enqueue the decode+select dispatches for one prompt round and
        return a handle — no host synchronization happens here, so a caller
        can overlap other host/transfer work (e.g. the previous round's
        deferred mask fetch) with this round's device execution before
        calling :meth:`select_finish`."""
        assert self._features is not None, "call set_image first"
        h2, w2 = self._input_hw
        hs = int(round(h2 * out_size / self.target_length))
        ws = int(round(w2 * out_size / self.target_length))
        pts_all = np.asarray(points_input_frame, np.float32)
        B = pts_all.shape[0]
        if chunk is None:
            # unlike the raw-logits path there is no full-res
            # materialization to cap (stats are phase-counted at lowres),
            # so one dispatch padded to /64 minimizes relay round-trips;
            # the two generation rounds (300/100 prompts) each compile once
            chunk = max(64, -(-B // 64) * 64)
        input_hw = jnp.asarray([h2, w2])
        iou_thr = jnp.asarray(iou_threshold, jnp.float32)
        stab_thr = jnp.asarray(stability_threshold, jnp.float32)

        pending = []
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
            pending.append(
                (lo, n, self._decode_select(
                    self.params, self._features, pts, labels, input_hw,
                    out_size, iou_thr, stab_thr,
                ))
            )
        handle = {"pending": pending, "hs": hs, "ws": ws}
        if nms_enabled and len(pending) == 1:
            # chain greedy NMS + survivor coverage on device: select_finish
            # then needs ONE batched sync (scalars + kept flags + coverage
            # plane) instead of scalars -> host NMS -> coverage round trips.
            # Multi-chunk dispatches (explicit small ``chunk``) keep the
            # host-NMS path — NMS must see every box at once.
            lo, n, (packed, iou_pick, kp_valid, boxes, pick) = pending[0]
            handle["nms"] = _select_nms_device(
                packed, iou_pick, kp_valid, boxes, jnp.int32(n),
                jnp.float32(box_nms_thresh), bool(filter_by_box_size),
            )
        return handle

    def select_finish(
        self,
        handle: dict,
        nms_enabled: bool = True,
        box_nms_thresh: float = 0.8,
        filter_by_box_size: bool = True,
        defer_masks: bool = False,
    ) -> dict:
        """Fetch the per-keypoint scalars of a :meth:`select_dispatch`
        handle, run box NMS on the host, and gather the survivor masks.

        ``defer_masks=True`` leaves the survivor masks bit-packed on device:
        the returned dict carries ``masks=None`` plus a :class:`DeferredMasks`
        under ``"deferred"`` (device coverage / device-resized BiNI masks /
        late host materialization)."""
        pending = handle["pending"]
        hs, ws = handle["hs"], handle["ws"]
        # ONE batched fetch for every chunk's scalars: device_get schedules
        # all async copies before blocking, so the 4-per-chunk arrays cost
        # ~one relay RTT instead of 4 sequential np.asarray round-trips
        # (~25 ms each on this container)
        packed_chunks = [(lo, n, packed) for lo, n, (packed, *_s) in pending]
        nms_dev = handle.get("nms")
        fetched = jax.device_get(
            [(iou_pick[:n], kp_valid[:n], boxes[:n], pick[:n])
             for lo, n, (packed, iou_pick, kp_valid, boxes, pick) in pending]
            + ([nms_dev] if nms_dev is not None else [])
        )
        coverage_packed = None
        if nms_dev is not None:
            kept_dev, coverage_packed = fetched.pop()
        iou_all = np.concatenate([f[0] for f in fetched])
        valid = np.concatenate([f[1] for f in fetched])
        boxes_all = np.concatenate([f[2] for f in fetched])
        pick_all = np.concatenate([f[3] for f in fetched])

        kp_ids = np.nonzero(valid)[0]
        if nms_dev is not None and nms_enabled and kp_ids.size:
            # kept SET computed on device; reconstruct torchvision's keep
            # ORDER (descending score, stable ties) from the same f32
            # boxes/iou the device used.  NOTE: host numpy and XLA f32
            # division are not guaranteed bitwise-identical on every
            # backend, so near-tied 1/area scores could order differently
            # from the host-NMS path in principle (parity tests pass on the
            # CPU/relay backends; the result is always self-consistent).
            n0 = pending[0][1]
            boxes_v = boxes_all[kp_ids]
            area = np.prod(boxes_v[:, 2:] - boxes_v[:, :2], axis=-1)
            scores = (
                (1.0 / np.maximum(area, 1e-9)).astype(np.float32)
                if filter_by_box_size else iou_all[kp_ids]
            )
            order = kp_ids[np.argsort(-scores, kind="stable")]
            sel_ids = order[kept_dev[:n0][order]]
        elif nms_enabled and kp_ids.size:
            from ...frontend.mask_generation import nms as _nms

            boxes_v = boxes_all[kp_ids]
            area = np.prod(boxes_v[:, 2:] - boxes_v[:, :2], axis=-1)
            scores = (
                1.0 / np.maximum(area, 1e-9)
                if filter_by_box_size else iou_all[kp_ids]
            )
            keep = _nms(boxes_v, scores, box_nms_thresh)
            sel_ids = kp_ids[keep]
        else:
            sel_ids = kp_ids

        # survivor fetch: padded gathers per chunk (dispatch all, then read)
        BUCKET = 64
        fetches = []
        for lo, n, packed in packed_chunks:
            rows = sel_ids[(sel_ids >= lo) & (sel_ids < lo + n)] - lo
            if rows.size == 0:
                continue
            cap = -(-rows.size // BUCKET) * BUCKET
            pad_rows = np.zeros(cap, np.int32)
            pad_rows[: rows.size] = rows
            fetches.append(
                (lo, rows, self._gather_rows(packed, jnp.asarray(pad_rows)))
            )
        order_pos = {int(g): i for i, g in enumerate(sel_ids)}
        deferred = DeferredMasks(
            fetches, order_pos, sel_ids.size, hs, ws, boxes=boxes_all[sel_ids]
        )
        out = {
            "masks": None if defer_masks else deferred.fetch(),
            "iou_preds": iou_all[sel_ids],
            "keypoints_ids": sel_ids,
            "boxes": boxes_all[sel_ids],
            "masks_ids": pick_all[sel_ids],
        }
        if defer_masks:
            out["deferred"] = deferred
            # coverage from the NMS dispatch chain ORs the KEPT set only —
            # valid solely when this finish actually applied that NMS
            # (a dispatch(nms)/finish(no-nms) caller must not see it)
            if coverage_packed is not None and nms_enabled:
                # survivor coverage already OR-reduced in the NMS dispatch
                # and fetched with the scalars above — saves the separate
                # DeferredMasks.coverage round trip (~30 ms on the relay)
                bits = np.unpackbits(coverage_packed, axis=-1)
                out["coverage"] = bits[:hs, :ws].astype(bool)
        return out

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
