"""SAM mask generation pipeline.

Reference: frontend/segment/mask_generation.py — random query points ->
SAM multimask logits -> IoU + stability filtering with smallest-good-mask
selection (:13-95) -> box NMS preferring smaller boxes (:179-189) ->
coverage-driven active resampling of uncovered 16x-pooled cells (:98-139) ->
second SAM round -> edge maps from mask gradients (:291-312) -> off-mask
keypoint filtering (:261-272).

The mask model is injected as ``predict(image, keypoints_norm) ->
(mask_logits (B, 3, H, W), iou (B, 3))`` so the Flax SAM predictor and test
fakes are interchangeable.  Selection/filtering is vectorized numpy (runs
once per keyframe; candidate count is data-dependent so host-side ragged
code is the right tool — the device work is the model itself).
"""

from __future__ import annotations

import numpy as np

MASK_THRESH = 0.0
STABILITY_OFFSET = 1.0


def calculate_stability_score(mask_logits: np.ndarray, thresh: float, offset: float):
    """IoU between thresholded masks at (t+o) and (t-o) — the SAM stability
    score (amg semantics)."""
    hi = (mask_logits > (thresh + offset)).sum(axis=(-2, -1), dtype=np.int64)
    lo = (mask_logits > (thresh - offset)).sum(axis=(-2, -1), dtype=np.int64)
    return hi / np.maximum(lo, 1)


def mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy boxes; empty masks give zero boxes
    (amg batched_mask_to_box semantics)."""
    N, H, W = masks.shape
    boxes = np.zeros((N, 4), np.float32)
    any_r = masks.any(axis=2)
    any_c = masks.any(axis=1)
    for i in range(N):
        rr = np.nonzero(any_r[i])[0]
        cc = np.nonzero(any_c[i])[0]
        if rr.size and cc.size:
            boxes[i] = [cc[0], rr[0], cc[-1] + 1, rr[-1] + 1]
    return boxes


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """torchvision-nms semantics: keep by descending score, suppress
    IoU > threshold.  Returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    ious = box_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= ious[i] > iou_threshold
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def smallest_good_mask_batch(
    mask_logits: np.ndarray,
    iou_pred: np.ndarray,
    iou_threshold: float = 0.0,
    stability_score_thresh: float = 0.90,
    select_smallest: bool = True,
    stability: np.ndarray | None = None,
    areas: np.ndarray | None = None,
):
    """Reference smallest_good_mask_batch (mask_generation.py:13-95).

    select_smallest: keep keypoints with >= 1 good candidate and pick their
    smallest good binarized mask; otherwise flatten all candidates and filter
    per-candidate.

    ``stability``/``areas`` (B, 3): precomputed full-resolution statistics
    from the device fast path (nets/sam/predictor.predict_points_with_stats);
    ``mask_logits`` may then be pre-binarized bool masks at working
    resolution.

    Returns dict(masks bool (M, H, W), iou_preds (M,), keypoints_ids (M,),
    boxes (M, 4)).
    """
    B = mask_logits.shape[0]
    kp_ids = np.arange(B)

    if select_smallest:
        good = np.ones((B, 3), bool)
        if iou_threshold > 0:
            good &= iou_pred > iou_threshold
            keep_kp = good.any(axis=1)
            mask_logits, iou_pred, good, kp_ids = (
                mask_logits[keep_kp], iou_pred[keep_kp], good[keep_kp], kp_ids[keep_kp]
            )
        if stability_score_thresh > 0:
            if stability is not None:
                stab = stability[kp_ids]
            else:
                stab = calculate_stability_score(
                    mask_logits, MASK_THRESH, STABILITY_OFFSET
                )
            good &= stab >= stability_score_thresh
            keep_kp = good.any(axis=1)
            mask_logits, iou_pred, good, kp_ids = (
                mask_logits[keep_kp], iou_pred[keep_kp], good[keep_kp], kp_ids[keep_kp]
            )
        if mask_logits.dtype == bool:
            masks_bin = mask_logits
        else:
            masks_bin = mask_logits > MASK_THRESH
        if areas is not None:
            sizes = areas[kp_ids].astype(np.float64)
        else:
            sizes = masks_bin.sum(axis=(-2, -1)).astype(np.float64)
        sizes[~good] = 1e6
        pick = sizes.argmin(axis=1)
        ar = np.arange(masks_bin.shape[0])
        masks = masks_bin[ar, pick]
        ious = iou_pred[ar, pick]
        result = {
            "masks": masks, "iou_preds": ious, "keypoints_ids": kp_ids,
            "masks_ids": pick,
        }
    else:
        flat_logits = mask_logits.reshape(-1, *mask_logits.shape[2:])
        flat_iou = iou_pred.reshape(-1)
        flat_kp = np.repeat(kp_ids, 3)
        keep = np.ones(len(flat_iou), bool)
        if iou_threshold > 0:
            keep &= flat_iou > iou_threshold
        if stability_score_thresh > 0:
            if stability is not None:
                stab = stability.reshape(-1)
            else:
                stab = calculate_stability_score(
                    flat_logits, MASK_THRESH, STABILITY_OFFSET
                )
            keep &= stab >= stability_score_thresh
        kept = flat_logits[keep]
        result = {
            "masks": kept if kept.dtype == bool else kept > MASK_THRESH,
            "iou_preds": flat_iou[keep],
            "keypoints_ids": flat_kp[keep],
        }
    result["boxes"] = mask_to_box(result["masks"])
    return result


def active_sample_pos(
    coverage_mask: np.ndarray, num_samples: int, rng: np.random.Generator,
    fine_noise: bool = True,
):
    """Categorical resampling of uncovered 16x-pooled cells + in-cell jitter
    (mask_generation.py:98-139).  coverage_mask (H, W) bool; returns
    normalized (row, col) keypoints (num_samples, 2)."""
    H, W = coverage_mask.shape
    down = 16
    cm = coverage_mask.copy()
    cm[-2:, :] = True  # SAM bottom-row artifact compensation (:105)
    Hc, Wc = H // down, W // down
    coarse = cm[: Hc * down, : Wc * down].reshape(Hc, down, Wc, down).mean(axis=(1, 3))
    density = 1.0 - coarse
    if density.sum() < 1e-9:
        # fully covered: fall back to uniform (the reference's Categorical
        # would fault here; coverage is never complete on real images)
        density = np.ones_like(density)
    p = density.ravel() / density.sum()

    flat = rng.choice(Hc * Wc, size=num_samples, p=p)
    cell_rc = np.stack([flat // Wc, flat % Wc], axis=1).astype(np.float32)
    dims_c = np.asarray([Hc, Wc], np.float32)
    norm = 2 * cell_rc / (dims_c - 1) - 1
    if fine_noise:
        dims = np.asarray([H, W], np.float32)
        jitter_px = rng.integers(0, down // 2, size=(num_samples, 2)).astype(np.float32)
        jitter = (2 * jitter_px / (dims - 1) - 1) + 1
        norm = np.clip(norm + jitter, -1, 1)
    return norm.astype(np.float32)


def masks_to_edges(masks: np.ndarray, defer: bool = False):
    """Max Scharr magnitude over masks (mask_generation.py:291-303).

    Reflect-pad Scharr/32, matching the reference's ImageGradientModule
    default (image_processing.py:5, reflect_padding=True).

    The binary masks are bit-packed on the host and unpacked on device —
    8x less host->device traffic (a 300-segment keyframe at 240x320 would
    otherwise upload ~90 MB of f32 over the relay); the unpack is exact, so
    numerics are unchanged.

    ``defer=True`` returns the DEVICE array (dispatch enqueued, not
    fetched): on the relay backend the blocking fetch costs ~one RTT plus
    the device time, which the frontend instead folds into its single
    batched ``device_get`` alongside the BiNI solve outputs.
    """
    import jax.numpy as jnp

    N, H, W = masks.shape
    packed = np.packbits(masks.astype(bool), axis=-1)  # (N, H, ceil(W/8))
    # bucket-pad the data-dependent mask count so the jit compiles once per
    # bucket, not once per distinct N (each new N was a fresh XLA compile —
    # seconds on the relay).  Zero rows contribute zero gradient, so the
    # max-reduce is unchanged.
    cap = max(64, 1 << (int(N - 1).bit_length())) if N else 64
    if cap > N:
        packed = np.concatenate(
            [packed, np.zeros((cap - N, *packed.shape[1:]), np.uint8)]
        )
    out = _packed_masks_to_edges(jnp.asarray(packed), W)
    return out if defer else np.asarray(out)


_PACKED_EDGES_JIT = None


def _packed_masks_to_edges(packed, W: int):
    global _PACKED_EDGES_JIT
    if _PACKED_EDGES_JIT is None:
        import functools

        import jax
        import jax.numpy as jnp

        from ..image.gradients import scharr_gradients

        @functools.partial(jax.jit, static_argnames=("W",))
        def run(p, W):
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            bits = (p[..., None] >> shifts) & jnp.uint8(1)  # (N, H, Wp, 8)
            N, H = p.shape[0], p.shape[1]
            f = bits.reshape(N, H, -1)[..., :W].astype(jnp.float32)
            gx, gy = scharr_gradients(f.transpose(1, 2, 0), reflect_padding=True)
            return jnp.max(jnp.sqrt(gx**2 + gy**2), axis=-1)

        _PACKED_EDGES_JIT = run
    return _PACKED_EDGES_JIT(packed, W)


def infer_edge_probs(masks: np.ndarray):
    edges = masks_to_edges(masks)
    return edges, np.clip(1 - 2 * edges, 0, 1)


def finish_edges_full(edges_np: np.ndarray):
    """Host tail of the full-resolution edge path for a prefetched device
    edge map (``masks_to_edges(defer=True)`` output already on host)."""
    probs = np.clip(1 - 2 * edges_np, 0, 1)
    return edges_np, probs, edges_np, probs


def finish_edges_coarse(edges_coarse_np: np.ndarray, hw: tuple[int, int]):
    """Host tail of the coarse-edge path (bilinear align_corners upsample,
    reference mask_generation.py:246-252) for a prefetched coarse edge map."""
    probs_coarse = np.clip(1 - 2 * edges_coarse_np, 0, 1)
    edges = bilinear_resize_ac(edges_coarse_np, hw)
    probs = bilinear_resize_ac(probs_coarse, hw)
    return edges, probs, edges_coarse_np, probs_coarse


def nearest_resize_batch(masks: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """(N, H, W) nearest resize with torch F.interpolate(mode='nearest')
    index semantics: src = floor(dst * H_in / H_out)."""
    Ho, Wo = hw
    Hi, Wi = masks.shape[-2:]
    ri = (np.arange(Ho) * Hi) // Ho
    ci = (np.arange(Wo) * Wi) // Wo
    return masks[..., ri[:, None], ci[None, :]]


def bilinear_resize_ac(img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """(H, W) bilinear resize with align_corners=True (torch semantics)."""
    Ho, Wo = hw
    Hi, Wi = img.shape
    ry = np.arange(Ho) * ((Hi - 1) / (Ho - 1) if Ho > 1 else 0.0)
    rx = np.arange(Wo) * ((Wi - 1) / (Wo - 1) if Wo > 1 else 0.0)
    y0 = np.clip(np.floor(ry).astype(np.int64), 0, Hi - 1)
    x0 = np.clip(np.floor(rx).astype(np.int64), 0, Wi - 1)
    y1 = np.minimum(y0 + 1, Hi - 1)
    x1 = np.minimum(x0 + 1, Wi - 1)
    wy = (ry - y0).astype(img.dtype if img.dtype.kind == "f" else np.float32)
    wx = (rx - x0).astype(wy.dtype)
    top = img[y0[:, None], x0[None, :]] * (1 - wx) + img[y0[:, None], x1[None, :]] * wx
    bot = img[y1[:, None], x0[None, :]] * (1 - wx) + img[y1[:, None], x1[None, :]] * wx
    return top * (1 - wy[:, None]) + bot * wy[:, None]


def infer_edge_probs_coarse(
    masks: np.ndarray, edge_probs_shape: tuple[int, int]
):
    """Coarse-edge path (reference mask_generation.py:234-252): nearest-
    downsample masks to ``edge_probs_shape``, compute edges there, bilinearly
    upsample (align_corners=True) back to the mask working resolution.

    Returns (edges, edge_probs, edges_coarse, edge_probs_coarse)."""
    H, W = masks.shape[-2:]
    masks_coarse = nearest_resize_batch(masks.astype(np.float32), edge_probs_shape) > 0.5
    edges_coarse, probs_coarse = infer_edge_probs(masks_coarse)
    edges = bilinear_resize_ac(edges_coarse, (H, W))
    probs = bilinear_resize_ac(probs_coarse, (H, W))
    return edges, probs, edges_coarse, probs_coarse


def infer_masks(
    predict_fn,
    image: np.ndarray,
    sam_params,
    keypoints: np.ndarray | None = None,
    num_pts: int = 300,
    num_pts_active: int = 100,
    rng: np.random.Generator | None = None,
    edge_probs_shape: tuple[int, int] | None = None,
    on_round1=None,
    timer=None,
    defer_edges: bool = False,
):
    """Full two-round mask generation (mask_generation.py:143-288).

    ``predict_fn(image, keypoints_norm) -> (logits (B, 3, H, W), iou (B, 3))``.
    Returns dict with masks, keypoints (normalized row-col), coverage, edges,
    plus per-mask provenance (``src_round`` 0/1 and ``src_idx`` — the row in
    that round's post-NMS selection) so callers can match results computed
    per round (e.g. overlapped BiNI dispatches) to the surviving masks.

    ``edge_probs_shape``: when set, edges are computed on masks nearest-
    downsampled to this shape and bilinearly upsampled back (the reference's
    coarse-edge path, mask_generation.py:234-252, wired from
    process_frame.py:113 with the integration shape).

    ``on_round1(masks)``: optional hook called with round 1's post-NMS masks
    before round 2 starts — lets the frontend overlap per-segment device work
    (BiNI) with the second SAM round.  Mask *contents* are final at that
    point when ``cut_masks_by_edges`` is off (later filters only drop rows).

    ``timer``: optional StageTimer; accumulates sam_round1/sam_round2/
    sam_edges sub-stages.
    """
    import contextlib

    def _stage(name):
        return timer.stage(name) if timer is not None else contextlib.nullcontext()

    rng = rng or np.random.default_rng(42)
    H, W = image.shape[:2]
    if keypoints is None:
        keypoints = (rng.random((num_pts, 2)) * 2 - 1).astype(np.float32)

    def run_round(kps):
        if getattr(predict_fn, "select_round", None) and sam_params.select_smallest:
            # device-side selection fast path: filtering/smallest-pick/boxes
            # happen inside the decode dispatch; only NMS survivors are
            # shipped (nets/sam/predictor.predict_points_select)
            sel = predict_fn.select_round(image, kps, sam_params)
            return sel, kps[sel["keypoints_ids"]]
        out = predict_fn(image, kps)
        stability = areas = None
        if len(out) == 4:  # device fast path with precomputed statistics
            logits, iou, stability, areas = out
        else:
            logits, iou = out
        sel = smallest_good_mask_batch(
            np.asarray(logits), np.asarray(iou),
            iou_threshold=sam_params.iou_threshold,
            stability_score_thresh=sam_params.stability_threshold,
            select_smallest=sam_params.select_smallest,
            stability=stability, areas=areas,
        )
        kps_f = kps[sel["keypoints_ids"]]
        if sam_params.nms:
            area = np.prod(sel["boxes"][:, 2:] - sel["boxes"][:, :2], axis=-1)
            scores = (
                1.0 / np.maximum(area, 1e-9)
                if sam_params.filter_by_box_size
                else sel["iou_preds"]
            )
            keep = nms(sel["boxes"], scores, sam_params.box_nms_thresh)
            sel = {k: v[keep] for k, v in sel.items()}  # incl. masks_ids
            kps_f = kps_f[keep]
        return sel, kps_f

    sr = getattr(predict_fn, "select_round", None)
    deferred_ok = (
        sr is not None
        and sam_params.select_smallest
        and getattr(sr, "dispatch", None) is not None
    )
    if deferred_ok:
        # Deferred-transfer flow: round 1's survivor masks stay ON DEVICE.
        # Coverage for active resampling ships as one OR-reduced packed
        # plane; the on_round1 hook gets the device handle (BiNI dispatches
        # from device-resized masks, no bool re-upload); the full host
        # masks materialize only AFTER round 2's decode is dispatched, so
        # their relay transfer overlaps round 2's device execution.
        with _stage("sam_round1"):
            h1 = sr.dispatch(image, keypoints, sam_params)
            sel = sr.finish(h1, sam_params, defer_masks=True)
            deferred = sel.pop("deferred")
            cov_pre = sel.pop("coverage", None)  # device-NMS dispatch chain
            kps_f = keypoints[sel["keypoints_ids"]]
        n1 = deferred.n_rows
        if n1:
            H, W = deferred.hs, deferred.ws  # mask working resolution
            coverage = cov_pre if cov_pre is not None else deferred.coverage()
        else:
            coverage = np.zeros((H, W), bool)
        if on_round1 is not None:
            on_round1(deferred if n1 else np.zeros((0, H, W), bool))

        num_added = 0
        sel["src_round"] = np.zeros(n1, np.int64)
        sel["src_idx"] = np.arange(n1)
        if num_pts_active > 0:
            kps_active = active_sample_pos(coverage, num_pts_active, rng)
            with _stage("sam_round2"):
                with _stage("sam_r2_dispatch"):
                    h2 = sr.dispatch(image, kps_active, sam_params)
                # round-1 survivor transfer rides under round-2's decode
                with _stage("sam_r1_fetch"):
                    sel["masks"] = deferred.fetch()
                with _stage("sam_r2_finish"):
                    sel2 = sr.finish(h2, sam_params)
                kps2_f = kps_active[sel2["keypoints_ids"]]
            num_added = len(kps2_f)
            sel = {
                "masks": np.concatenate([sel["masks"], sel2["masks"]], axis=0),
                "iou_preds": np.concatenate([sel["iou_preds"], sel2["iou_preds"]]),
                "boxes": np.concatenate([sel["boxes"], sel2["boxes"]], axis=0),
                "src_round": np.concatenate(
                    [sel["src_round"], np.ones(num_added, np.int64)]
                ),
                "src_idx": np.concatenate([sel["src_idx"], np.arange(num_added)]),
            }
            kps_f = np.concatenate([kps_f, kps2_f], axis=0)
        else:
            sel["masks"] = deferred.fetch()
    else:
        with _stage("sam_round1"):
            sel, kps_f = run_round(keypoints)
        if len(sel["masks"]):
            H, W = sel["masks"].shape[-2:]  # mask working resolution
            coverage = sel["masks"].any(axis=0)
        else:
            coverage = np.zeros((H, W), bool)
        n1 = len(sel["masks"])
        if on_round1 is not None:
            on_round1(sel["masks"])

        num_added = 0
        sel["src_round"] = np.zeros(n1, np.int64)
        sel["src_idx"] = np.arange(n1)
        if num_pts_active > 0:
            kps_active = active_sample_pos(coverage, num_pts_active, rng)
            with _stage("sam_round2"):
                sel2, kps2_f = run_round(kps_active)
            num_added = len(kps2_f)
            sel = {
                "masks": np.concatenate([sel["masks"], sel2["masks"]], axis=0),
                "iou_preds": np.concatenate([sel["iou_preds"], sel2["iou_preds"]]),
                "boxes": np.concatenate([sel["boxes"], sel2["boxes"]], axis=0),
                "src_round": np.concatenate(
                    [sel["src_round"], np.ones(num_added, np.int64)]
                ),
                "src_idx": np.concatenate([sel["src_idx"], np.arange(num_added)]),
            }
            kps_f = np.concatenate([kps_f, kps2_f], axis=0)

    # cut_masks_by_edges consumes edge_probs in-pipeline, so the edge fetch
    # can only be deferred (folded into the caller's batched device_get)
    # when the cut is off — true in every reference config.
    defer_edges = (
        defer_edges and not sam_params.cut_masks_by_edges and len(sel["masks"])
    )
    edges_dev = edges_finish = None
    with _stage("sam_edges"):
        if not len(sel["masks"]):
            edges = edges_coarse = np.zeros((H, W), np.float32)
            edge_probs = edge_probs_coarse = np.ones((H, W), np.float32)
        elif defer_edges:
            # dispatch now (device work overlaps the caller's BiNI solve),
            # fetch later: the caller ships the edge map home inside its
            # one batched device_get and runs the finish tail on host
            edges = edge_probs = edges_coarse = edge_probs_coarse = None
            if edge_probs_shape is None:
                edges_dev = masks_to_edges(sel["masks"], defer=True)
                edges_finish = finish_edges_full
            else:
                mc = nearest_resize_batch(
                    sel["masks"].astype(np.float32), tuple(edge_probs_shape)
                ) > 0.5
                edges_dev = masks_to_edges(mc, defer=True)
                _hw = tuple(sel["masks"].shape[-2:])
                edges_finish = lambda e, _hw=_hw: finish_edges_coarse(e, _hw)
        elif edge_probs_shape is None:
            edges, edge_probs = infer_edge_probs(sel["masks"])
            edges_coarse, edge_probs_coarse = edges, edge_probs
        else:
            edges, edge_probs, edges_coarse, edge_probs_coarse = (
                infer_edge_probs_coarse(sel["masks"], tuple(edge_probs_shape))
            )

    if sam_params.cut_masks_by_edges and len(sel["masks"]):
        valid = edge_probs > sam_params.edge_probs_threshold
        sel["masks"] = sel["masks"] & valid[None]

    if sam_params.filter_edge_points and len(sel["masks"]):
        dims = np.asarray([H, W], np.float32)
        kp_px = np.round(0.5 * (dims - 1) * (kps_f + 1)).astype(np.int64)
        on_mask = sel["masks"][np.arange(len(kps_f)), kp_px[:, 0], kp_px[:, 1]]
        sel = {k: v[on_mask] for k, v in sel.items()}
        kps_f = kps_f[on_mask]

    final_coverage = (
        sel["masks"].any(axis=0) if len(sel["masks"]) else np.zeros((H, W), bool)
    )
    return {
        "masks": sel["masks"],
        "iou_preds": sel["iou_preds"],
        "keypoints": kps_f,
        "src_round": sel["src_round"],
        "src_idx": sel["src_idx"],
        "num_active": num_added,
        "coarse_coverage": coverage,
        "final_coverage": final_coverage,
        "edges": edges,
        "edge_probs": edge_probs,
        "edge_coarse": edges_coarse,
        "edge_probs_coarse": edge_probs_coarse,
        # deferred-edge handle (None unless defer_edges): the caller fetches
        # edges_dev (batched with its other device reads) and passes the
        # host array to edges_finish -> (edges, probs, coarse, probs_coarse)
        "edges_dev": edges_dev,
        "edges_finish": edges_finish,
    }
