"""Full perception frontend: normals -> SAM masks -> BiNI integration -> KF.

Reference: frontend/process_frame.py (FrontProcessorNew).  Pipeline per
keyframe (:121-255):
  1. surface-normal net at network_dim (480x640), normals NN-resized to the
     integration shape (240x320) with K rescaled accordingly;
  2. SAM mask generation at infer_resolution (960x1280), masks NN-resized
     back to image res then to the integration shape;
  3. batched BiNI integration per segment -> depth up to scale;
  4. image bilinearly downsampled to KF size (1/2^downsample_pow), the
     integrated depth NN-resized to KF size, validity = depth > 1e-7,
     keypoints snapped into masks, log taken in-mask (:231-236);
  5. optional depth-discontinuity split (:246-250).

Models are injected as callables so the Flax SAM/NNET and test fakes are
interchangeable:
  normals_fn(image_hwc01) -> (normals (H, W, 3), kappa (H, W, 1))
  mask_predict_fn(image_hwc_uint8, keypoints_norm) -> (logits (B,3,H,W), iou)
"""

from __future__ import annotations

from typing import Callable, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import Config
from ..integrate.bini import BiniConfig, integrate_to_depth
from ..keyframe import put_keypoints_back
from .mask_generation import infer_masks
from .post_process import split_disconnected_segments


def _nn_resize(x: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize on (..., H, W) or (H, W, C) arrays."""
    H, W = hw
    if (x.shape[:2] if x.ndim == 2 or x.shape[-1] <= 4 else x.shape[-2:]) == (H, W):
        return x  # identity resize: the copy/loop below would be pure waste
    if x.ndim == 2:
        return cv2.resize(x, (W, H), interpolation=cv2.INTER_NEAREST)
    if x.ndim == 3 and x.shape[-1] <= 4:
        return cv2.resize(x, (W, H), interpolation=cv2.INTER_NEAREST)
    # leading-batch masks (N, H, W)
    return np.stack(
        [cv2.resize(m.astype(np.uint8), (W, H), interpolation=cv2.INTER_NEAREST)
         for m in x]
    ).astype(x.dtype)


import functools


@functools.partial(jax.jit, static_argnames=("W",))
def _gather_unpack_masks(packed_dev, idx, W: int):
    """Gather segment rows from a bit-packed (N, H, ceil(W/8)) uint8 mask
    stack and unpack to (len(idx), H, W) bool — all on device.  Lets the
    BiNI dispatch upload the keyframe's masks ONCE at 1/8 the bytes instead
    of one full-res bool stack per crop bucket (the mask upload was the
    dominant cost of the non-deferred dispatch at ~300 segments)."""
    rows = packed_dev[idx]
    bits = (rows[..., None] >> jnp.arange(7, -1, -1, dtype=jnp.uint8)) & 1
    full = bits.reshape(rows.shape[0], rows.shape[1], -1)
    return full[..., :W].astype(bool)


def _pow2_cap(n: int, base: int) -> int:
    """Smallest ``base * 2^k`` >= n: a geometric capacity ladder bounds the
    number of DISTINCT padded shapes (each fresh shape is a 30-60 s remote
    compile on the relay backend; linear 32-step padding produced a new
    shape almost every keyframe)."""
    cap = base
    while cap < n:
        cap *= 2
    return cap


def _pad_bucket(m: np.ndarray, bucket: int):
    """Pad a leading segment axis up the power-of-two ladder so the jitted
    BiNI solvers compile once per ladder step, not per keyframe."""
    n = m.shape[0]
    cap = _pow2_cap(n, bucket)
    if cap == n:
        return m, n
    out = np.zeros((cap,) + m.shape[1:], m.dtype)
    out[:n] = m
    return out, n


# Crop-size buckets for the per-segment BiNI solve, smallest first: each
# segment routes to the smallest window its bbox fits (else the full field).
# Most SAM segments at integration resolution have ~20-30 px bboxes (median
# 27 at 304 segments / 240x320), so the 32/64 buckets carry nearly all of
# them at 4-16x fewer solve pixels AND 4-16x fewer fetched bytes than a
# single 128 window — the crop fetch is the dominant relay cost of a
# ~300-segment keyframe.
CROP_BUCKETS = (32, 64, 128)


def _integration_leaves(handle: dict) -> list:
    """Device arrays of a ``_dispatch_integration`` handle, in the order
    ``_composite_integration`` consumes them — so callers can fetch several
    handles (plus unrelated arrays) in one batched ``jax.device_get``."""
    leaves = []
    for b in handle.get("buckets", ()):
        leaves += list(b["out"])  # zt_c, r0, c0
    if "full_out" in handle:
        leaves.append(handle["full_out"])
    return leaves


def _composite_integration(handle: dict, leaves_np: list) -> np.ndarray:
    """Composite prefetched solve outputs (``_integration_leaves`` order,
    already on host) into per-segment depth fields (N, H, W): exp of the
    log-depth inside the mask, zero outside (process_frame.py:231-236)."""
    if "deferred" in handle and "masks" not in handle:
        # host compositing masks: the deferred fetch is cached (already
        # materialized by infer_masks during round 2), so this is a
        # resize, not a transfer
        handle["masks"] = _nn_resize(
            handle["deferred"].fetch().astype(np.uint8), handle["geo"]
        ).astype(bool)
    masks = handle["masks"]
    N, H, W = masks.shape
    depth = np.zeros((N, H, W), np.float32)

    pos = 0
    for b in handle.get("buckets", ()):
        zt_c, r0, c0 = leaves_np[pos : pos + 3]
        pos += 3
        n = b["n"]
        zt_c, r0, c0 = zt_c[:n], r0[:n], c0[:n]
        ch, cw = zt_c.shape[1:]
        for j, i in enumerate(b["idx"]):
            rr, cc = int(r0[j]), int(c0[j])
            win = masks[i, rr : rr + ch, cc : cc + cw]
            depth[i, rr : rr + ch, cc : cc + cw] = np.exp(zt_c[j]) * win
    if "full_out" in handle:
        zt = leaves_np[pos][: handle["n_big"]]
        for j, i in enumerate(handle["big_idx"]):
            depth[i] = np.exp(zt[j]) * masks[i]
    return depth


def scale_K(K: np.ndarray, scale_h: float, scale_w: float) -> np.ndarray:
    """Anisotropic K rescale (tool/camera.py:12-22)."""
    K = np.asarray(K, np.float64).copy()
    K[0] *= scale_w
    K[1] *= scale_h
    return K


class FrontProcessor:
    def __init__(
        self,
        config: Config,
        normals_fn: Callable,
        mask_predict_fn: Callable,
        rng: Optional[np.random.Generator] = None,
    ):
        self.config = config
        self.normals_fn = normals_fn
        self.mask_predict_fn = mask_predict_fn
        self.rng = rng or np.random.default_rng(42)
        # optional StageTimer (utils/timing.py): when set, per-keyframe
        # stages (normals / sam_masks / bini / split) are accumulated
        self.timer = None

    def _stage(self, name):
        import contextlib

        return self.timer.stage(name) if self.timer else contextlib.nullcontext()

    # ------------------------------------------------------------------
    def process_to_kf(self, image, K, keypoints=None, loose=False) -> dict:
        fc = self.config.frontend
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        H, W = image.shape[:2]
        Hg, Wg = fc.normals.integration_shape
        K_geom = scale_K(K, Hg / H, Wg / W)

        # 1. normals at network dim (dispatch only — the fetch overlaps the
        # SAM rounds below: NNET's device work and its ~20 MB host transfer
        # hide behind the mask generation's compute, saving most of the
        # normals wall time; BiNI consumes the normals only after masks)
        img01 = image.astype(np.float32) / 255.0
        with self._stage("normals_dispatch"):
            # real-NNET path uploads the uint8 bytes (4x smaller relay
            # transfer; /255 happens on device, equal up to one f32
            # rounding) — fakes and other callables keep the float [0,1]
            # contract
            nin = (
                image if getattr(self.normals_fn, "accepts_uint8", False)
                else img01
            )
            normals_dev, kappa = self.normals_fn(nin)

        # 2. SAM masks at infer_resolution
        sam_hw = self.config.sam_params.infer_resolution
        sam_img = cv2.resize(
            image, (sam_hw[1], sam_hw[0]), interpolation=cv2.INTER_LINEAR
        )
        preload = getattr(self.mask_predict_fn, "preload", None)
        if preload is not None:
            # async upload of the (resized) SAM frame while NNET runs on
            # device; set_image inside the first prompt round consumes it
            preload(sam_img)
        sam_params = self.config.sam_params
        if loose:
            # depth-completion fallback (segment_based_completion.py:33-35)
            import dataclasses

            sam_params = dataclasses.replace(
                sam_params, nms=False, select_smallest=False
            )

        # BiNI overlap: when mask CONTENTS are final after each round (all
        # later steps only drop rows — cut_masks_by_edges would edit them)
        # and the device normals already sit at the integration shape,
        # round 1's integration is dispatched while SAM round 2 runs, hiding
        # its dispatch+device latency behind the second decode round.
        bini_cfg = BiniConfig(cg_max_iter=fc.cg_max_iter, cg_tol=fc.cg_tol)
        normals_at_geo = (
            hasattr(normals_dev, "shape") and tuple(normals_dev.shape[:2]) == (Hg, Wg)
        )
        overlap = (
            (not sam_params.cut_masks_by_edges)
            and normals_at_geo
            and not getattr(self, "disable_overlap", False)  # test hook
        )
        K_j = jnp.asarray(K_geom, jnp.float32)
        r1_handle = []

        def on_round1(masks_r1):
            if hasattr(masks_r1, "device_masks_resized"):  # DeferredMasks
                if masks_r1.n_rows == 0 or Hg < masks_r1.hs or Wg < masks_r1.ws:
                    # downsampled integration shape: resized_bbox_sizes is
                    # only exact when resizing up — take the host path
                    masks_r1 = masks_r1.fetch()
                else:
                    r1_handle.append(
                        self._dispatch_integration_deferred(
                            normals_dev, masks_r1, K_j, bini_cfg, (Hg, Wg)
                        )
                    )
                    return
            if masks_r1.shape[0] == 0:
                r1_handle.append(None)
                return
            mc = _nn_resize(masks_r1, (Hg, Wg)).astype(bool)
            r1_handle.append(
                self._dispatch_integration(normals_dev, mc, K_j, bini_cfg)
            )

        with self._stage("sam_masks"):
            gen = infer_masks(
                self.mask_predict_fn, sam_img, sam_params,
                keypoints=keypoints,
                num_pts=fc.num_pts, num_pts_active=fc.num_pts_active,
                rng=self.rng,
                # coarse-edge path at the integration shape
                # (reference process_frame.py:113 passes int_normal_shape)
                edge_probs_shape=(Hg, Wg),
                on_round1=on_round1 if overlap else None,
                timer=self.timer,
                # fold the edge-map fetch into the batched BiNI device_get
                # below instead of blocking inside the sam_edges stage
                # (~RTT + device time off the critical path per keyframe)
                defer_edges=overlap,
            )
        masks = gen["masks"]
        if masks.shape[0] == 0:
            raise RuntimeError("frontend produced no masks")

        # 3. BiNI integration per segment at geometry resolution.
        # Crop/full routing: most segments fit a small window (crop-based
        # solve is exact and ~(HW/crop^2)x cheaper); oversized ones take the
        # full-field path.  Segment counts are bucket-padded so the jitted
        # solvers compile once per bucket, not per keyframe.
        if overlap:
            with self._stage("bini"):
                # round-2 survivors dispatched now; round 1 already in flight
                is_r2 = gen["src_round"] == 1
                depth_perseg = np.zeros((masks.shape[0], Hg, Wg), np.float32)
                h2 = None
                if is_r2.any():
                    mc2 = _nn_resize(masks[is_r2], (Hg, Wg)).astype(bool)
                    h2 = self._dispatch_integration(normals_dev, mc2, K_j, bini_cfg)
                # ONE batched fetch for both rounds' solve outputs AND the
                # normals field: device_get schedules every copy before
                # blocking, so this costs ~one relay RTT instead of the 4-6
                # sequential np.asarray round-trips (~25 ms each) it replaces
                h1 = r1_handle[0] if r1_handle else None
                handles = [h for h in (h1, h2) if h is not None]
                leaves = [_integration_leaves(h) for h in handles]
                flat = [a for ls in leaves for a in ls]
                tail = [normals_dev]
                if gen.get("edges_dev") is not None:
                    tail.append(gen["edges_dev"])
                fetched = jax.device_get(flat + tail)
                normals = fetched[len(flat)]
                if gen.get("edges_dev") is not None:
                    # deferred edge map came home in the same device_get;
                    # run the host finish tail (probs + coarse upsample)
                    (
                        gen["edges"], gen["edge_probs"],
                        gen["edge_coarse"], gen["edge_probs_coarse"],
                    ) = gen["edges_finish"](fetched[len(flat) + 1])
                pos = 0
                for h, ls in zip(handles, leaves):
                    d = _composite_integration(h, fetched[pos : pos + len(ls)])
                    pos += len(ls)
                    if h is h1:
                        is_r1 = gen["src_round"] == 0
                        depth_perseg[is_r1] = d[gen["src_idx"][is_r1]]
                    else:
                        depth_perseg[is_r2] = d
            with self._stage("normals_fetch"):
                normals = np.asarray(normals)
        else:
            masks_coarse = _nn_resize(masks, (Hg, Wg)).astype(bool)
            # normals fetch (overlapped with the SAM rounds above) + NN resize
            with self._stage("normals_fetch"):
                normals = np.asarray(normals_dev)
            if normals.shape[:2] != (Hg, Wg):
                normals = _nn_resize(normals, (Hg, Wg))
            with self._stage("bini"):
                h = self._dispatch_integration(
                    jnp.asarray(normals), masks_coarse, K_j, bini_cfg
                )
                depth_perseg = self._fetch_integration(h)

        # 4. downsample image to KF size; depth NN-resized; log in-mask
        with self._stage("host_pack"):
            s = 2 ** fc.downsample_pow
            H_kf, W_kf = H // s, W // s
            K_kf = scale_K(K, H_kf / H, W_kf / W)
            image_kf = cv2.resize(
                img01, (W_kf, H_kf), interpolation=cv2.INTER_LINEAR
            ).astype(np.float32)
            if fc.include_normals:
                # append NN-resized normal channels (process_frame.py:191-205;
                # the reference computes but never appends kappa — same here)
                n_kf = _nn_resize(normals, (H_kf, W_kf)).astype(np.float32)
                image_kf = np.concatenate([image_kf, n_kf], axis=-1)

            Ng, Hgd, Wgd = depth_perseg.shape
            fy, fx = H_kf // Hgd, W_kf // Wgd
            if (Hgd, Wgd) == (H_kf, W_kf):
                depth_kf = depth_perseg  # geometry res == KF res (TUM configs)
            elif fy * Hgd == H_kf and fx * Wgd == W_kf and fy >= 1 and fx >= 1:
                # integer up-ratio: block-repeat == cv2 INTER_NEAREST (dst
                # i -> floor(i*src/dst) = i//f), one single-pass copy vs a
                # per-segment cv2 loop (~5 s for 215 maps at 2x on host)
                depth_kf = np.broadcast_to(
                    depth_perseg[:, :, None, :, None],
                    (Ng, Hgd, fy, Wgd, fx),
                ).reshape(Ng, H_kf, W_kf)
            else:
                depth_kf = np.stack(
                    [_nn_resize(d, (H_kf, W_kf)) for d in depth_perseg]
                )
            regions = depth_kf > 1e-7
            kps, regions, depth_kf = put_keypoints_back(
                gen["keypoints"], regions, depth_kf
            )
            # log only in-region AND only inside each segment's bbox: the
            # where= ufunc still scans the full (N, H, W) stack (265 MB x2
            # at odom scale, ~0.4 s host); bbox crops touch the ~5-10%
            # that matters (a full-stack np.log measured ~900 ms even at
            # 72x240x320)
            logdepth = np.zeros(depth_kf.shape, np.float32)
            rows_any = regions.any(axis=2)
            cols_any = regions.any(axis=1)
            Hk, Wk = regions.shape[1:]
            for _i in range(regions.shape[0]):
                if not rows_any[_i].any():
                    continue
                _r0 = int(rows_any[_i].argmax())
                _r1 = Hk - int(rows_any[_i][::-1].argmax())
                _c0 = int(cols_any[_i].argmax())
                _c1 = Wk - int(cols_any[_i][::-1].argmax())
                dc = depth_kf[_i, _r0:_r1, _c0:_c1]
                rc = regions[_i, _r0:_r1, _c0:_c1]
                lc = logdepth[_i, _r0:_r1, _c0:_c1]
                np.log(
                    np.maximum(dc, 1e-30, where=rc, out=lc),
                    out=lc, where=rc,
                )

            dims = np.asarray([H_kf, W_kf], np.float32)
            kp_rc = np.round(0.5 * (dims - 1) * (kps + 1)).astype(np.int64)

        # 5. depth-discontinuity split
        if fc.check_for_depth_disc:
            with self._stage("split"):
                regions, logdepth, kp_rc = split_disconnected_segments(
                    regions, logdepth.astype(np.float32), kp_rc,
                    fc.depth_disc_params.filter_size,
                    fc.depth_disc_params.depth_threshold,
                    fc.depth_disc_params.area_keep_ratio,
                    rng=self.rng, timer=self.timer,
                )

        return {
            "image": image_kf,
            "K": K_kf.astype(np.float32),
            "regions": regions,
            "logdepth_perseg": logdepth.astype(np.float32),
            "keypoints_rc": kp_rc,
            "normals": normals,
            "edges": gen["edges"],
        }

    def _dispatch_integration(
        self, normals_dev, masks, K_j, bini_cfg, crop: int | None = None
    ) -> dict:
        """Host-side crop/full routing + bucket padding for BiNI; enqueues
        the device work and returns a handle — results cross the relay only
        at :meth:`_fetch_integration` (crop-sized, ~(HW/crop^2)x fewer bytes
        than full fields).

        Each segment takes the smallest :data:`CROP_BUCKETS` window its bbox
        fits (the crop solve is exact whenever the bbox fits); oversized
        segments fall through to the full-field solver.  ``crop`` forces a
        single bucket (tests)."""
        from ..integrate.bini import (
            integrate_normals,
            integrate_normals_cropped,
            segment_bbox_sizes,
        )

        crops = CROP_BUCKETS if crop is None else (crop,)
        masks = np.asarray(masks, bool)
        hs, ws = segment_bbox_sizes(masks)
        ext = np.maximum(hs, ws)
        assigned = np.zeros(masks.shape[0], bool)
        handle = {"masks": masks, "buckets": []}

        # ONE bit-packed upload serves every bucket (1/8 the bytes of a bool
        # stack); per-bucket row gathers + unpack happen on device.  The
        # stack always carries >=1 zero row so padded idx slots solve an
        # empty mask instead of re-solving segment 0 (wasted device work
        # when the row count is an exact multiple of the pad quantum).
        packed_rows = np.packbits(masks, axis=-1)
        n_rows = packed_rows.shape[0]
        cap = _pow2_cap(n_rows + 1, 32)  # >= n_rows+1: always a zero pad row
        packed = np.zeros((cap,) + packed_rows.shape[1:], packed_rows.dtype)
        packed[:n_rows] = packed_rows
        packed_dev = jnp.asarray(packed)
        W = masks.shape[2]
        fill = cap - 1

        def pad_idx(idx, bucket):
            out = np.full(_pow2_cap(idx.size, bucket), fill, np.int32)
            out[: idx.size] = idx
            return out

        for c in sorted(crops):
            sel = (~assigned) & (ext <= c)
            if sel.any():
                idx = np.nonzero(sel)[0]
                m_b = _gather_unpack_masks(packed_dev, jnp.asarray(pad_idx(idx, 32)), W)
                out = integrate_normals_cropped(
                    normals_dev, m_b, K_j, bini_cfg, c, return_crops=True
                )
                handle["buckets"].append({"out": out, "n": idx.size, "idx": idx})
                assigned |= sel
        if (~assigned).any():
            idx_b = np.nonzero(~assigned)[0]
            m_big = _gather_unpack_masks(packed_dev, jnp.asarray(pad_idx(idx_b, 8)), W)
            handle["full_out"] = integrate_normals(normals_dev, m_big, K_j, bini_cfg)
            handle["n_big"] = idx_b.size
            handle["big_idx"] = idx_b
        return handle

    def _dispatch_integration_deferred(
        self, normals_dev, deferred, K_j, bini_cfg, geo_hw, crop: int | None = None
    ) -> dict:
        """BiNI dispatch straight from device-resident SAM survivor masks
        (nets.sam.predictor.DeferredMasks): crop/full routing comes from the
        selection boxes (exact for up-resizes), the integration-resolution
        masks are gathered/unpacked/nearest-resized on device — no mask
        bytes cross the relay before the solve.  Same smallest-fitting
        :data:`CROP_BUCKETS` routing as :meth:`_dispatch_integration`."""
        import numpy as np

        from ..integrate.bini import integrate_normals, integrate_normals_cropped

        crops = CROP_BUCKETS if crop is None else (crop,)
        Hg, Wg = geo_hw
        hs_r, ws_r = deferred.resized_bbox_sizes(Hg, Wg)
        ext = np.maximum(hs_r, ws_r)
        assigned = np.zeros(len(ext), bool)
        handle = {"deferred": deferred, "geo": geo_hw, "buckets": []}

        for c in sorted(crops):
            sel = (~assigned) & (ext <= c)
            if sel.any():
                idx = np.nonzero(sel)[0]
                cap = _pow2_cap(idx.size, 32)
                m_b = deferred.device_masks_resized(idx, cap, Hg, Wg)
                out = integrate_normals_cropped(
                    normals_dev, m_b, K_j, bini_cfg, c, return_crops=True
                )
                handle["buckets"].append({"out": out, "n": idx.size, "idx": idx})
                assigned |= sel
        if (~assigned).any():
            idx_b = np.nonzero(~assigned)[0]
            cap = _pow2_cap(idx_b.size, 8)
            m_big = deferred.device_masks_resized(idx_b, cap, Hg, Wg)
            handle["full_out"] = integrate_normals(normals_dev, m_big, K_j, bini_cfg)
            handle["n_big"] = idx_b.size
            handle["big_idx"] = idx_b
        return handle

    def _fetch_integration(self, handle: dict) -> np.ndarray:
        """Materialize a :meth:`_dispatch_integration` handle into per-segment
        depth fields (N, H, W): exp of the log-depth inside the mask, zero
        outside (process_frame.py:231-236 semantics).  All device leaves come
        back in one batched ``device_get`` (one relay round-trip)."""
        leaves = _integration_leaves(handle)
        return _composite_integration(handle, jax.device_get(leaves))

    def process_to_supp_kf(self, image, K) -> dict:
        image = np.asarray(image)
        if image.dtype == np.uint8:
            image = image.astype(np.float32) / 255.0
        s = 2 ** self.config.frontend.downsample_pow
        H, W = image.shape[:2]
        H_kf, W_kf = H // s, W // s
        img = cv2.resize(image, (W_kf, H_kf), interpolation=cv2.INTER_LINEAR)
        img = img.astype(np.float32)
        if self.config.frontend.include_normals:
            normals, _ = self.normals_fn(image)
            n_kf = _nn_resize(np.asarray(normals), (H_kf, W_kf)).astype(np.float32)
            img = np.concatenate([img, n_kf], axis=-1)
        return {
            "image": img,
            "K": scale_K(K, H_kf / H, W_kf / W).astype(np.float32),
        }


def wire_mask_predictor(predictor):
    """mask_generation-protocol wrappers around a :class:`SamPredictor`
    (or anything duck-typing its set_image/select_dispatch/select_finish
    surface, e.g. the structured device fake in frontend/fakes.py).

    Returns ``mask_predict_fn`` with ``.select_round`` (two-phase dispatch/
    finish protocol for the deferred-transfer flow) and ``.preload``
    attached — the contract infer_masks keys on.
    """

    def _to_input_xy(image_uint8, kps_norm):
        predictor.set_image(image_uint8)
        h2, w2 = predictor._input_hw
        # keypoints normalized (row, col) -> input-frame (x, y) pixels
        dims = np.asarray([h2, w2], np.float32)
        rc = 0.5 * (dims - 1) * (np.asarray(kps_norm) + 1)
        return np.round(rc[:, ::-1])

    def mask_predict_fn(image_uint8, kps_norm):
        """Fast path: binary masks at ~1/4 SAM resolution plus device-side
        full-resolution stability/area statistics — avoids shipping
        full-res float logits to the host (~500x less transfer)."""
        xy = _to_input_xy(image_uint8, kps_norm)
        return predictor.predict_points_with_stats(xy, out_size=256)

    def select_round(image_uint8, kps_norm, sam_params):
        """Faster path: selection + NMS scoring on device, ship only the
        NMS survivors bit-packed (mask_generation.run_round protocol)."""
        xy = _to_input_xy(image_uint8, kps_norm)
        return predictor.predict_points_select(
            xy,
            iou_threshold=sam_params.iou_threshold,
            stability_threshold=sam_params.stability_threshold,
            nms_enabled=sam_params.nms,
            box_nms_thresh=sam_params.box_nms_thresh,
            filter_by_box_size=sam_params.filter_by_box_size,
            out_size=256,
        )

    def _select_dispatch(image_uint8, kps_norm, sam_params):
        xy = _to_input_xy(image_uint8, kps_norm)
        return predictor.select_dispatch(
            xy,
            iou_threshold=sam_params.iou_threshold,
            stability_threshold=sam_params.stability_threshold,
            out_size=256,
            nms_enabled=sam_params.nms,
            box_nms_thresh=sam_params.box_nms_thresh,
            filter_by_box_size=sam_params.filter_by_box_size,
        )

    def _select_finish(handle, sam_params, defer_masks=False):
        return predictor.select_finish(
            handle,
            nms_enabled=sam_params.nms,
            box_nms_thresh=sam_params.box_nms_thresh,
            filter_by_box_size=sam_params.filter_by_box_size,
            defer_masks=defer_masks,
        )

    # two-phase protocol: lets infer_masks defer round-1 mask transfer
    # behind round-2's decode and keep BiNI's masks device-resident
    select_round.dispatch = _select_dispatch
    select_round.finish = _select_finish
    mask_predict_fn.select_round = select_round
    # upload overlap: the frontend preloads the SAM frame right after the
    # NNET dispatch so the ~2.4 MB relay transfer rides NNET's device time
    # instead of sitting serially in front of the encoder dispatch
    mask_predict_fn.preload = predictor.preload_image
    return mask_predict_fn


def build_frontend(config: Config, sam_params_tree=None, nnet_params=None):
    """Wire the real Flax models into a FrontProcessor.

    Checkpoints are converted torch weights (nets/convert.py); when absent
    this raises — use the stub frontends for checkpoint-free runs.
    """
    if sam_params_tree is None or nnet_params is None:
        raise ValueError(
            "SAM/NNET parameters required; convert the reference checkpoints "
            "with nets/convert.py or use frontend.stub for synthetic runs"
        )
    from ..nets.nnet import predict_normals
    from ..nets.sam.predictor import SamPredictor

    predictor = SamPredictor(sam_params_tree, compute_dtype=jnp.bfloat16)

    def normals_fn(img):
        # fp32: NNET is memory-layout bound at this size (47 ms device,
        # bf16 measured identical), so keep full precision.  With normals
        # consumed only at the integration shape (include_normals off),
        # the NN subsample runs on device and only ~1 MB crosses the relay
        # (identical values for the reference's integer resize ratios).
        # Accepts uint8 (preferred: 4x smaller upload, /255 on device) or
        # float [0,1].
        coarse = (
            None if config.frontend.include_normals
            else tuple(config.frontend.normals.integration_shape)
        )
        return predict_normals(
            nnet_params, jnp.asarray(img),
            tuple(config.frontend.normals.network_dim),
            coarse_hw=coarse,
        )

    normals_fn.accepts_uint8 = True

    return FrontProcessor(config, normals_fn, wire_mask_predictor(predictor))
