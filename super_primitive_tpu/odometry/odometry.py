"""Monocular visual odometry driver (workload: TUM MonoVO).

Host-side state machine reproducing odometery/odometery.py's per-frame loop
(:1018-1088): track -> per-frame 'supp' mapping -> scheduled 'map' mapping ->
keyframe gating -> keyframe init (+ depth re-init from rendered depth) ->
window roll.  All heavy compute (tracking scans, mapping while_loops, depth
scatter render) runs jitted on device via tracker.py / mapper.py /
ops/scatter.py; this file only shuffles slots and timestamps.

The frontend is injected (``process_to_kf(image, K)`` -> host geometry,
``process_to_supp_kf`` -> image only), so the full SAM+normals+BiNI frontend
and test stubs (GT-depth segment grids) are interchangeable — mirrors
setup_new_front_processor (frontend/process_frame.py:19-23).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import Config
from ..cost import photometric as ph
from ..image import pyramid as pyr
from ..keyframe import PointBundle, build_bundle_np
from ..lie import se3
from ..ops.scatter import render_depth
from . import depth_init, io, kf_criteria, mapper, tracker, window


import functools


def _render_kf_depth(buffers, kf_slot, pose, geo_dims):
    """Render KF ``kf_slot``'s points into the camera at ``pose`` (traced;
    odometery.py:294-321 + core/depth_render.py)."""
    from ..geometry import projection

    i = kf_slot
    bundle = buffers.bundle_at(i)
    delta = jnp.matmul(
        se3.inverse(pose), buffers.poses[i], precision=jax.lax.Precision.HIGHEST
    )
    logd = ph.spread_logdepth(bundle, buffers.kp_logdepth[i], buffers.kp_base[i])
    pts = projection.unproject(bundle.uv, jnp.exp(logd), buffers.K[i])
    pts = projection.transform(pts, delta)
    depth, _ = render_depth(pts, buffers.K[i], geo_dims, valid=bundle.valid)
    return depth


@functools.partial(jax.jit, static_argnames=("geo_dims",))
def _render_kf_depth_jit(buffers, kf_slot, pose, geo_dims):
    """ONE-dispatch depth render: the eager chain this replaces cost ~30
    tiny remote compiles + dispatches per keyframe add on the relay."""
    return _render_kf_depth(buffers, kf_slot, pose, geo_dims)


@functools.partial(jax.jit, static_argnames=("trim",))
def _slot_slices_jit(buffers, i, trim=None):
    """All per-slot device slices the tracker consumes, in ONE dispatch
    (each eager ``x[i]`` is a separate ~30 ms relay round-trip).  ``trim``
    statically slices the point axis — see WindowBuffers.bundle_at."""
    sl = slice(None) if trim is None else slice(0, trim)
    return {
        "uv": buffers.uv[i, sl], "seg_id": buffers.seg_id[i, sl],
        "base_logdepth": buffers.base_logdepth[i, sl],
        "point_valid": buffers.point_valid[i, sl],
        "num_valid": buffers.num_valid[i],
        "K": buffers.K[i], "kp_logdepth": buffers.kp_logdepth[i],
        "kp_base": buffers.kp_base[i], "affine": buffers.affine[i],
    }


@functools.partial(jax.jit, static_argnames=("geo_dims",))
def _gating_metrics(buffers, kf_slot, pose, geo_dims):
    """One-dispatch keyframe gating (odometery.py:986-1016): render the last
    KF's points at ``pose``, return (validity_ratio, median-depth-scaled
    translation diff, median scale) as three scalars — avoids downloading
    the depth map just to gate."""
    depth = _render_kf_depth(buffers, kf_slot, pose, geo_dims)
    i = kf_slot
    valid = depth > 1e-6
    validity_ratio = jnp.mean(valid.astype(jnp.float32))
    diff, scale = kf_criteria.translation_difference(
        pose, buffers.poses[i], depth
    )
    return validity_ratio, diff, scale


class Frontend(Protocol):
    def process_to_kf(self, image: np.ndarray, K: np.ndarray) -> dict: ...
    def process_to_supp_kf(self, image: np.ndarray, K: np.ndarray) -> dict: ...


@dataclasses.dataclass
class TrackedFrame:
    timestamp: str
    image: jax.Array           # device image (H, W, C)
    pose: np.ndarray           # (4, 4) world
    affine: np.ndarray         # (2,)


class Odometry:
    def __init__(self, config: Config, frontend: Frontend, dataset):
        self.config = config
        self.frontend = frontend
        self.dataset = dataset

        self.window_size = config.window_size
        self.supp_cap = max(2, config.alignment.mapping.supp_every_n - 1)
        self.affine_compensation = config.alignment.affine_compensation
        self.opt_supporting = config.alignment.opt_supporting
        self.mono_init = config.alignment.mono_init

        self.buffers: Optional[window.WindowBuffers] = None
        self.host_kfs: list[window.HostKeyFrame] = []
        self.num_kfs = 0
        self.seg_cap = None
        self.point_cap = None

        # host mirror of buffers.supp_valid — every supp mutation is
        # host-driven, so connectivity construction never fetches the device
        # array (one relay round-trip per frame saved)
        self.supp_valid_host: Optional[np.ndarray] = None
        self._last_gate: Optional[tuple] = None  # fused-step gating metrics
        self._host_ld_dirty = False

        # per-slot bundle num_valid mirror (parallel to host_kfs): feeds the
        # static point-axis trims (_point_trim / _map_trim)
        self._nvalid_slots: list[int] = []
        self.tracked: list[TrackedFrame] = []
        self.current_track: Optional[np.ndarray] = None
        self.current_aff = np.zeros(2, np.float32)
        self.current_ts: Optional[str] = None

        self.initialised = False
        self.mapping_scheduled = False
        self.global_kf_trajectory: dict[str, np.ndarray] = {}
        self.global_track_trajectory: dict[str, np.ndarray] = {}
        self.frame_timestamps: dict[str, float] = {}
        # (timestamp, wall_s, n_segments) per init_keyframe — lets drivers
        # and bench.py report warm KF-add cost without parsing stdout
        self.kf_add_log: list[tuple[str, float, int]] = []

        self._kf_pyramid_cache = None  # (kf_ts, list of level images)

        from ..utils.compile_watch import CompileWatch
        from ..utils.timing import StageTimer

        self.timer = StageTimer()
        self.compile_watch = CompileWatch.install()
        # frontend stages (sam rounds / bini / split) land in the same timer
        if getattr(frontend, "timer", "absent") is None:
            frontend.timer = self.timer
        # optional live-viz hook: callable(odom, frame_id), set by drivers
        # (run_sfm --live-viz); see viz/live.py
        self.live_cb = None

    # ------------------------------------------------------------- helpers
    @staticmethod
    def id_to_timestamp(frame_id: int) -> str:
        return str(frame_id).zfill(6)  # odometery.py:120-121

    def _geo_dims(self):
        return self.host_kfs[-1].logdepth_perseg.shape[1:]

    def _trim_for(self, n: Optional[int]) -> Optional[int]:
        """Static point-axis trim covering ``n`` valid points.  The window
        point capacity carries 2x headroom, and the solvers' cost is linear
        in the padded point count, so dispatching at full cap pays ~2x the
        valid-point FLOPs (measured: 716 ms vs a 307 ms bench for the same
        300-iter Adam track schedule).  Bundles are front-compacted and
        every reduction is validity-masked and num_valid-normalized, so any
        trim >= num_valid is exact.  A two-step ladder (HW, 1.5*HW) bounds
        distinct compile shapes at 2 beyond the full capacity."""
        if n is None or self.point_cap is None or not self.host_kfs:
            return None
        if os.environ.get("SP_DISABLE_POINT_TRIM"):  # A/B kill switch
            return None
        Hg, Wg = self._geo_dims()
        for mult in (1.0, 1.5):
            cap = int(np.ceil(mult * Hg * Wg / 1024) * 1024)
            if n <= cap < self.point_cap:
                return cap
        return None  # full capacity

    def _point_trim(self) -> Optional[int]:
        """Trim for latest-KF dispatches (track / fused step / supp)."""
        return self._trim_for(getattr(self, "_nvalid_latest", None))

    def _map_trim(self) -> Optional[int]:
        """Trim for window-wide mapping (must cover EVERY slot's points)."""
        ns = getattr(self, "_nvalid_slots", None)
        return self._trim_for(max(ns) if ns else None)

    def _last_bundle(self) -> PointBundle:
        b = self.buffers
        i = self.num_kfs - 1
        trim = self._point_trim()
        # cache by buffer-tree identity: every eager ``x[i]`` on a device
        # array is its own relay dispatch (~30 ms RTT), and track_frame pays
        # 9 of them per frame otherwise.  Buffers are replaced functionally
        # on every mutation, so identity captures staleness exactly.
        key = (id(b), i, trim)
        if getattr(self, "_slot_cache_key", None) != key:
            self._slot_cache_key = key
            self._slot_cache = _slot_slices_jit(b, jnp.asarray(i), trim=trim)
        sl = self._slot_cache
        return PointBundle(
            uv=sl["uv"], seg_id=sl["seg_id"], base_logdepth=sl["base_logdepth"],
            valid=sl["point_valid"], num_valid=sl["num_valid"],
        )

    def _slot_arrays(self):
        """(K, kp_logdepth, kp_base, affine) device slices of the latest KF
        slot, from the same one-dispatch cache as :meth:`_last_bundle`."""
        self._last_bundle()
        sl = self._slot_cache
        return sl["K"], sl["kp_logdepth"], sl["kp_base"], sl["affine"]

    def estimate_depth_latest_kf(self, pose: np.ndarray) -> np.ndarray:
        """Render last KF's points into the camera at ``pose``
        (odometery.py:294-321 + core/depth_render.py) — one jitted dispatch,
        one fetch."""
        depth = _render_kf_depth_jit(
            self.buffers, jnp.asarray(self.num_kfs - 1),
            jnp.asarray(pose, jnp.float32), tuple(self._geo_dims()),
        )
        return np.asarray(depth)

    # -------------------------------------------------------- keyframe init
    def init_keyframe(self, frame: dict, pose: np.ndarray, timestamp: str):
        t0 = time.time()
        cm = self.compile_watch.mark()
        counts0 = dict(self.timer.counts)
        observe = getattr(self.frontend, "observe", None)
        if observe is not None:
            observe(frame)
        with self.timer.stage("kf_frontend"):
            kf_data = self.frontend.process_to_kf(
                frame["image"], frame["intrinsics"]
            )
        regions = kf_data["regions"]
        logdepth = kf_data["logdepth_perseg"]
        keypoints_rc = kf_data["keypoints_rc"]
        image = kf_data["image"]          # (H, W, C) float32, KF resolution
        K = kf_data["K"]                  # geometry intrinsics
        N_i, Hg, Wg = regions.shape

        if self.seg_cap is None:
            # capacities fixed at first keyframe (static shapes thereafter)
            self.seg_cap = max(64, int(np.ceil(N_i * 1.5 / 32) * 32))
            self.point_cap = int(
                np.ceil(max(int(regions.sum()) * 2, Hg * Wg) / 1024) * 1024
            )
            self.buffers = window.empty_window(
                self.window_size, self.supp_cap, image.shape[:2],
                image.shape[2], self.seg_cap, self.point_cap,
            )
            self.supp_valid_host = np.zeros(
                (self.window_size, self.supp_cap), bool
            )

        # depth init (odometery.py:124-196)
        if self.num_kfs < 2:
            if self.mono_init:
                kp_logdepth = np.zeros(N_i, np.float32)  # log(1.0)
            else:
                # GT init: direct lookup at keypoints; per-segment median
                # fallback when any lookup is invalid (odometery.py:141-158)
                gt = np.asarray(frame["depth"], np.float32)
                if gt.shape != (Hg, Wg):
                    sy, sx = gt.shape[0] // Hg, gt.shape[1] // Wg
                    gt = gt[::sy, ::sx][:Hg, :Wg]
                direct = gt[keypoints_rc[:, 0], keypoints_rc[:, 1]]
                if np.any(direct < 1e-6):
                    kp_logdepth = depth_init.segment_based_depth_reinit(
                        gt, regions, logdepth, keypoints_rc, mode="median"
                    )
                else:
                    kp_logdepth = np.log(direct).astype(np.float32)
                # GT init marks the system initialised immediately
                # (odometery.py:159): no init-mode mapping, normal gating
                # and supp refinement from frame 1
                self.initialised = True
        else:
            with self.timer.stage("kf_depth_reinit"):
                est = self.estimate_depth_latest_kf(pose)
                kp_logdepth = depth_init.segment_based_depth_reinit(
                    est, regions, logdepth, keypoints_rc, mode="median"
                )
        assert np.all(np.isfinite(kp_logdepth))

        host_kf = window.HostKeyFrame(
            timestamp=timestamp, image=image, K=K, regions=regions,
            logdepth_perseg=logdepth, keypoints_rc=keypoints_rc,
            pose=np.asarray(pose, np.float32), kp_logdepth=kp_logdepth,
            affine=self.current_aff.copy(),
        )

        # window roll (odometery.py:184-194)
        if self.num_kfs == self.window_size:
            with self.timer.stage("kf_roll"):
                if self.config.dump_kfs:
                    self._sync_host_logdepth()
                    io.dump_kf(
                        self.config.save_path + "/curr_kfs", self.host_kfs[0]
                    )
                self.host_kfs.pop(0)
                self._nvalid_slots.pop(0)
                self.buffers = window.roll_window(self.buffers)
                self.supp_valid_host = np.concatenate(
                    [self.supp_valid_host[1:],
                     np.zeros_like(self.supp_valid_host[:1])]
                )
                self.num_kfs -= 1

        slot = self.num_kfs
        with self.timer.stage("kf_bundle"):
            bundle = build_bundle_np(regions, logdepth, capacity=self.point_cap)
            kp_base = logdepth[
                np.arange(N_i), keypoints_rc[:, 0], keypoints_rc[:, 1]
            ]
        with self.timer.stage("kf_slot_put"):
            self.buffers = window.set_keyframe_slot(
                self.buffers, slot, image, K, pose, kp_logdepth,
                self.current_aff, np.asarray(bundle.uv),
                np.asarray(bundle.seg_id), np.asarray(bundle.base_logdepth),
                np.asarray(bundle.valid), int(bundle.num_valid), kp_base,
                p_used=self._trim_for(int(bundle.num_valid)),
                timer=self.timer,
            )
        self.supp_valid_host[slot] = False
        self.host_kfs.append(host_kf)
        self._nvalid_latest = int(bundle.num_valid)  # feeds _point_trim
        self._nvalid_slots.append(int(bundle.num_valid))
        self.num_kfs += 1
        self.global_kf_trajectory[timestamp] = np.asarray(pose)
        self._kf_pyramid_cache = None
        self.kf_add_log.append((timestamp, time.time() - t0, N_i))
        stages = {
            (k[3:] if k.startswith("kf_") else k): round(1000 * v)
            for k, v in self.timer.last.items()
            if self.timer.counts[k] > counts0.get(k, 0)
        }
        print(
            f"[kf] added {timestamp} (N={N_i}, {time.time()-t0:.2f}s; "
            f"stages_ms={stages}; {self.compile_watch.summary_since(cm)})",
            flush=True,
        )

    # ------------------------------------------------------------ tracking
    def _kf_track_pyramid(self):
        ts = self.host_kfs[-1].timestamp
        if self._kf_pyramid_cache is None or self._kf_pyramid_cache[0] != ts:
            img = self.buffers.images[self.num_kfs - 1]
            levels = pyr.image_pyramid(
                img, self.config.alignment.track.pyramid_min,
                self.config.alignment.track.pyramid_max,
            )
            self._kf_pyramid_cache = (ts, levels)
        return self._kf_pyramid_cache[1]

    def track_frame(self, frame: dict, timestamp: str) -> dict:
        t0 = time.time()
        timer_ctx = self.timer.stage("track")
        timer_ctx.__enter__()
        with self.timer.stage("track_prep"):
            # frame resize + ~900 KB host->device image upload: the wall gap
            # between bench.py's solver-only number and the driver lives here
            supp = self.frontend.process_to_supp_kf(
                frame["image"], frame["intrinsics"]
            )
            trg_image = jnp.asarray(supp["image"])
        kf_pyr = self._kf_track_pyramid()
        i = self.num_kfs - 1
        b = self.buffers

        T_init = self.current_track
        track_cfg = self.config.alignment.track
        K_i, kp_ld_i, kp_base_i, affine_i = self._slot_arrays()
        if track_cfg.solver == "gn":
            from ..solve.gauss_newton import gn_track_frame

            trg_pyr = pyr.image_pyramid(
                trg_image, track_cfg.pyramid_min, track_cfg.pyramid_max
            )
            # run GN at the levels the step schedule marks active
            levels = [lv for lv, n in enumerate(track_cfg.steps) if n > 0]
            T_frame, affine, infos = gn_track_frame(
                self._last_bundle(), kf_pyr, trg_pyr, K_i,
                kp_ld_i, kp_base_i,
                jnp.asarray(self.host_kfs[-1].pose), jnp.asarray(T_init),
                affine_i, jnp.asarray(self.current_aff),
                self._geo_dims(), levels=levels,
                max_iters=track_cfg.gn_max_iters,
                use_affine=self.affine_compensation,
            )
            # report the finest level's final cost like the Adam path does
            losses = [[float(infos[-1].final_cost)]] if infos else []
        else:
            # one dispatch + one 19-float fetch (see track_frame_fused)
            with self.timer.stage("track_put"):
                args_small = (
                    jnp.asarray(self.host_kfs[-1].pose), jnp.asarray(T_init),
                    jnp.asarray(self.current_aff),
                    jnp.asarray(track_cfg.lr), jnp.asarray(5e-3),
                )
            with self.timer.stage("track_dispatch"):
                out = tracker.track_frame_fused(
                    self._last_bundle(), tuple(kf_pyr), trg_image, K_i,
                    kp_ld_i, kp_base_i,
                    args_small[0], args_small[1],
                    affine_i, args_small[2], args_small[3], args_small[4],
                    self._geo_dims(), tuple(track_cfg.steps),
                    track_cfg.pyramid_min, track_cfg.pyramid_max,
                    bool(self.affine_compensation),
                )
            with self.timer.stage("track_fetch"):
                packed = np.asarray(out)
            T_frame = packed[:16].reshape(4, 4)
            affine = packed[16:18]
            losses = [[float(packed[18])]]
        T_frame_np = np.asarray(T_frame)
        self.current_track = T_frame_np
        self.current_aff = np.asarray(affine)
        self.current_ts = timestamp
        self.tracked.append(
            TrackedFrame(timestamp, trg_image, T_frame_np, self.current_aff.copy())
        )
        self.global_track_trajectory[timestamp] = T_frame_np
        timer_ctx.__exit__(None, None, None)
        loss = float(losses[-1][-1]) if losses else float("nan")
        sub = "".join(
            f" {k[6:]}={1000 * self.timer.last[k]:.0f}"
            for k in ("track_prep", "track_put", "track_dispatch", "track_fetch")
            if k in self.timer.last
        )
        print(
            f"tracking time {time.time()-t0:.3f} sec, tracking loss = "
            f"{loss:.4f} (ms:{sub})" if sub else
            f"tracking time {time.time()-t0:.3f} sec, tracking loss = {loss:.4f}",
            flush=True,
        )
        return {"pose": T_frame_np, "affine": self.current_aff, "ts": timestamp}

    # ------------------------------------------------- fused per-frame step
    def _fused_enabled(self) -> bool:
        """One-dispatch steady-state frames: GN track + GN supp refinement
        (the performance path).  Other solver configs use the unfused
        parity path."""
        cfg = self.config.alignment
        return (
            self.initialised
            and cfg.track.solver == "gn"
            and cfg.mapping.solver == "gn"
            and self.num_kfs >= 1
        )

    def fused_frame(self, frame: dict, timestamp: str) -> dict:
        """track + supp-slot refresh + supp refinement + gating in ONE
        device dispatch (odometry/fused_step.py).  Host transfers: image
        upload, dispatch, one packed fetch."""
        from .fused_step import fused_frame_step

        t0 = time.time()
        with self.timer.stage("fused_frame"):
            supp = self.frontend.process_to_supp_kf(
                frame["image"], frame["intrinsics"]
            )
            trg_image = jnp.asarray(supp["image"])
            i = self.num_kfs - 1
            track_cfg = self.config.alignment.track
            levels = tuple(
                lv for lv, n in enumerate(track_cfg.steps) if n > 0
            )
            prev = self.tracked[-1] if self.tracked else None
            prev_valid = prev is not None
            # connectivity for supp refinement, from the post-update mirror
            self.supp_valid_host[i] = False
            self.supp_valid_host[i, 0] = True
            self.supp_valid_host[i, 1] = prev_valid
            slots = mapper.build_slots(
                self.num_kfs, self.window_size, self.supp_valid_host, "supp"
            )
            do_supp = self.config.alignment.mapping.continual_steps > 0

            zero_img = prev.image if prev_valid else trg_image
            new_buffers, packed, ld_row = fused_frame_step(
                self.buffers, jnp.asarray(i), trg_image,
                jnp.asarray(self.current_track, jnp.float32),
                jnp.asarray(self.current_aff, jnp.float32),
                zero_img,
                jnp.asarray(prev.pose if prev_valid else np.eye(4), jnp.float32),
                jnp.asarray(prev.affine if prev_valid else np.zeros(2), jnp.float32),
                jnp.asarray(prev_valid),
                jnp.asarray(slots.trg_index[i]), jnp.asarray(slots.trg_valid[i]),
                tuple(self._geo_dims()), levels,
                track_cfg.pyramid_min, track_cfg.pyramid_max,
                max_iters=track_cfg.gn_max_iters,
                use_affine=bool(self.affine_compensation),
                do_supp=do_supp,
                point_trim=self._point_trim(),
            )
            out = np.asarray(packed)  # single fetch: pose+affine+gating
            self.buffers = new_buffers
            self._host_ld_dirty = True

        T_frame = out[:16].reshape(4, 4).astype(np.float32)
        affine = out[16:18].astype(np.float32)
        self._last_gate = (float(out[18]), float(out[19]), float(out[20]))
        self.current_track = T_frame
        self.current_aff = affine
        self.current_ts = timestamp
        self.tracked.append(TrackedFrame(timestamp, trg_image, T_frame, affine.copy()))
        self.global_track_trajectory[timestamp] = T_frame
        print(
            f"tracking time {time.time()-t0:.3f} sec (fused), "
            f"tracking loss = {float(out[21]):.4f}",
            flush=True,
        )
        return {"pose": T_frame, "affine": affine, "ts": timestamp}

    def _sync_host_logdepth(self):
        """Refresh host_kfs' kp_logdepth copies after fused updates (lazy:
        only checkpoint/dump paths need host values)."""
        if not self._host_ld_dirty:
            return
        lds = np.asarray(self.buffers.kp_logdepth)
        for i in range(self.num_kfs):
            n_i = self.host_kfs[i].kp_logdepth.shape[0]
            self.host_kfs[i].kp_logdepth = lds[i, :n_i]
        self._host_ld_dirty = False

    # ------------------------------------------------------------- mapping
    def _refresh_latest_supp_from_tracked(self):
        """tracked_poses_to_supp (odometery.py:1272-1290): last two tracked
        frames become the newest KF's supporting slots."""
        i = self.num_kfs - 1
        self.buffers = window.clear_supporting(self.buffers, i)
        self.supp_valid_host[i] = False
        n = len(self.tracked)
        ids = sorted({k for k in (n - 1, n - 2) if 0 <= k < n})
        for j, k in enumerate(ids):
            tf = self.tracked[k]
            self.buffers = window.set_supporting_slot(
                self.buffers, i, j, tf.image, tf.pose, tf.affine
            )
            self.supp_valid_host[i, j] = True
        self._latest_supp_count = len(ids)

    def _flush_tracked_to_prev_kf(self):
        """flush_tracked_poses_to_supp (odometery.py:1318-1330): subsampled
        tracked frames attach to the (still) newest KF before the new one is
        added."""
        n = len(self.tracked)
        each_n = self.config.alignment.mapping.supp_every_n
        ids = sorted({i * (n - 1) // each_n + 1 for i in range(1, each_n)})
        ids = [i for i in ids if 0 <= i < n]
        i = self.num_kfs - 1
        self.buffers = window.clear_supporting(self.buffers, i)
        self.supp_valid_host[i] = False
        for j, k in enumerate(ids[: self.supp_cap]):
            tf = self.tracked[k]
            self.buffers = window.set_supporting_slot(
                self.buffers, i, j, tf.image, tf.pose, tf.affine
            )
            self.supp_valid_host[i, j] = True

    def mapping(self, num_iters: int, mode: str = "map"):
        assert mode in ("init", "map", "supp")
        if mode != "supp":
            self._last_gate = None  # poses change; fused gating is stale
        t0 = time.time()
        timer_ctx = self.timer.stage(f"mapping_{mode}")
        timer_ctx.__enter__()
        if mode == "init":
            self.buffers = window.clear_supporting(self.buffers)
            self.supp_valid_host[:] = False
            self.tracked = []
        else:
            if self.initialised:
                self._refresh_latest_supp_from_tracked()

        supp_valid = self.supp_valid_host
        slots = mapper.build_slots(self.num_kfs, self.window_size, supp_valid, mode)
        masks = mapper.build_masks(
            self.num_kfs, self.window_size, supp_valid, mode,
            self.window_size, self.opt_supporting, self.affine_compensation,
        )
        map_cfg = self.config.alignment.mapping
        if mode == "supp":
            # specialized single-source path (runs every frame; the general
            # mapper would compute all W sources and mask them out)
            i = self.num_kfs - 1
            if map_cfg.solver == "gn":
                ld, _losses = mapper.run_supp_refinement_gn(
                    self.buffers, jnp.asarray(i),
                    jnp.asarray(slots.trg_index[i]),
                    jnp.asarray(slots.trg_valid[i]),
                    bool(self.affine_compensation),
                    tuple(self._geo_dims()),
                    point_trim=self._point_trim(),
                )
            else:
                ld, _losses = mapper.run_supp_refinement(
                    self.buffers, jnp.asarray(i),
                    jnp.asarray(slots.trg_index[i]), jnp.asarray(slots.trg_valid[i]),
                    jnp.asarray(1e-2), jnp.asarray(num_iters),
                    bool(self.affine_compensation),
                    tuple(self._geo_dims()),
                    point_trim=self._point_trim(),
                )
            self.buffers = self.buffers.replace(
                kp_logdepth=self.buffers.kp_logdepth.at[i].set(ld)
            )
            lds = np.asarray(self.buffers.kp_logdepth)
            n_i = self.host_kfs[i].kp_logdepth.shape[0]
            self.host_kfs[i].kp_logdepth = lds[i, :n_i]
            self._update_track_pose(mode)
            self.initialised = True
            timer_ctx.__exit__(None, None, None)
            return
        map_cost_note = ""
        if map_cfg.solver == "gn":
            from ..solve.gn_mapping import gn_mapping

            gn_res = gn_mapping(
                self.buffers,
                jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
                jnp.asarray(slots.src_valid),
                jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
                jnp.asarray(masks.affine_mask),
                tuple(self._geo_dims()),
                max_iters=map_cfg.gn_max_iters,
                use_affine=self.affine_compensation,
                drag_supporting=jnp.asarray(
                    0.0 if self.opt_supporting else 1.0
                ),
                point_stride=map_cfg.gn_point_stride,
                point_trim=self._map_trim(),
                # mono init's global-scale null direction makes LM's damping
                # trajectory f32-noise-sensitive (PARITY.md); pin the gauge.
                # Only valid while the frozen first pose is the identity.
                pin_scale_gauge=(mode == "init" and bool(self.mono_init)),
            )
            result = mapper.MapResult(
                params=mapper.MapParams(
                    poses=gn_res.poses, xi=jnp.zeros((gn_res.poses.shape[0], 6)),
                    kp_logdepth=gn_res.kp_logdepth, affine=gn_res.affine,
                ),
                losses=jnp.zeros(1), num_iters=gn_res.num_iters,
            )
            map_cost_note = (
                f", cost {float(gn_res.initial_cost):.5f}"
                f" -> {float(gn_res.final_cost):.5f}"
            )
        else:
            lr_pose = 1e-2 if (mode == "init" and self.mono_init) else 1e-4
            result = mapper.run_mapping(
                self.buffers,
                jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
                jnp.asarray(slots.src_valid),
                jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
                jnp.asarray(masks.affine_mask),
                jnp.asarray(lr_pose), jnp.asarray(1e-2), jnp.asarray(1e-5),
                jnp.asarray(num_iters), jnp.asarray(self.initialised),
                bool(self.affine_compensation),
                tuple(self._geo_dims()),
                drag_supporting=jnp.asarray(
                    0.0 if self.opt_supporting else 1.0
                ),
                point_trim=self._map_trim(),
            )
        self.buffers = mapper.write_back(self.buffers, result.params)

        # host bookkeeping: poses + trajectories (odometery.py:948-967);
        # one batched fetch — each separate np.asarray pays a relay RTT
        poses, lds = jax.device_get(
            (self.buffers.poses, self.buffers.kp_logdepth)
        )
        for i in range(self.num_kfs):
            self.host_kfs[i].pose = poses[i]
            n_i = self.host_kfs[i].kp_logdepth.shape[0]
            self.host_kfs[i].kp_logdepth = lds[i, :n_i]
            self.global_kf_trajectory[self.host_kfs[i].timestamp] = poses[i]

        self._update_track_pose(mode)
        timer_ctx.__exit__(None, None, None)
        if mode != "supp":
            print(
                f"Mapping[{mode}] time {time.time()-t0:.3f} sec "
                f"({int(result.num_iters)} iters{map_cost_note})",
                flush=True,
            )
        self.initialised = True

    def _update_track_pose(self, mode):
        """odometery.py:969-985: continue tracking from the newest refined
        pose — the latest supporting frame if newer than the last KF."""
        latest_kf_ts = int(self.host_kfs[-1].timestamp)
        i = self.num_kfs - 1
        supp_valid = self.supp_valid_host[i]
        # ONE batched fetch of the (tiny) pose/affine pools, indexed on host:
        # eager device slices here cost 2-4 relay dispatches per mapping call
        # (and supp refinement maps EVERY frame)
        b = self.buffers
        poses, affine, supp_poses, supp_affine = jax.device_get(
            (b.poses, b.affine, b.supp_poses, b.supp_affine)
        )
        if self.tracked and supp_valid.any() and int(self.tracked[-1].timestamp) > latest_kf_ts:
            j = int(supp_valid.nonzero()[0][-1])
            self.current_track = supp_poses[i, j]
            self.current_aff = supp_affine[i, j]
        else:
            self.current_track = poses[i]
            self.current_aff = affine[i]
            self.current_ts = self.host_kfs[-1].timestamp

    # ------------------------------------------------------------- gating
    def is_kf(self, timestamp: str):
        """odometery.py:986-1016."""
        start_id = self.config.dataset.start_id
        num_init = self.config.alignment.init_frames
        if int(timestamp) - start_id < num_init and not self.initialised:
            return False, None
        if int(timestamp) - start_id == num_init and not self.initialised:
            return True, None

        if self._last_gate is not None:
            validity_ratio, diff, scale = self._last_gate
            self._last_gate = None
        else:
            validity_ratio, diff, scale = map(float, _gating_metrics(
                self.buffers, jnp.asarray(self.num_kfs - 1),
                jnp.asarray(self.current_track, jnp.float32),
                tuple(self._geo_dims()),
            ))
        is_kf = False
        if validity_ratio < self.config.kf.depth_validity_ratio:
            is_kf = True
            print(f"new kf: low depth validity ratio {validity_ratio:.3f}")
        if diff > self.config.kf.translation_thresh:
            is_kf = True
            print(f"new kf: large pose diff {diff:.3f}")
        if os.environ.get("SP_DEBUG_GATING"):
            print(
                f"[gate] {timestamp} validity={validity_ratio:.3f} "
                f"diff={diff:.4f} scale={scale:.4f}", flush=True,
            )
        return is_kf, scale

    # -------------------------------------------------- checkpoint / resume
    def save_state(self, tag: Optional[str] = None):
        """Periodic checkpoint (odometery.py:1164-1204): window KFs + both
        trajectories under <save_path>/curr_kfs/<tag>/ and traj/."""
        tag = tag or (self.current_ts or "init")
        self._sync_host_logdepth()
        kf_dir = f"{self.config.save_path}/curr_kfs/{tag}"
        for kf in self.host_kfs:
            io.dump_kf(kf_dir, kf)
        traj_dir = f"{self.config.save_path}/traj"
        io.save_trajectory(traj_dir, self.global_kf_trajectory, tag)
        io.save_trajectory(
            traj_dir, self.global_track_trajectory, tag, name="track_traj"
        )
        import json

        with open(f"{traj_dir}/frame_timestamps_{tag}.json", "w") as f:
            json.dump(self.frame_timestamps, f)
        with open(f"{kf_dir}/window.txt", "w") as f:
            f.write("\n".join(kf.timestamp for kf in self.host_kfs))
        return kf_dir

    def load_state(self, state_path: str, frame_id: int):
        """Resume a run (odometery.py:1090-1162): reload window keyframes and
        trajectories, continue from ``frame_id`` + 1."""
        tag = self.id_to_timestamp(frame_id)
        kf_dir = f"{state_path}/curr_kfs/{tag}"
        with open(f"{kf_dir}/window.txt") as f:
            timestamps = [line.strip() for line in f if line.strip()]
        traj_dir = f"{state_path}/traj"
        self.global_kf_trajectory = io.load_trajectory(
            f"{traj_dir}/kf_traj_{tag}.json"
        )
        self.global_track_trajectory = io.load_trajectory(
            f"{traj_dir}/track_traj_{tag}.json"
        )
        # pre-restore frame timestamps are needed by the final TUM export
        import json
        import os

        ts_file = f"{traj_dir}/frame_timestamps_{tag}.json"
        if os.path.exists(ts_file):
            with open(ts_file) as f:
                self.frame_timestamps.update(json.load(f))
        else:  # older checkpoints: recover from the dataset
            for fid in set(self.global_kf_trajectory) | set(self.global_track_trajectory):
                self.frame_timestamps[fid] = float(
                    self.dataset[int(fid)].get("timestamp", int(fid))
                )
        for ts in timestamps:
            kf = io.load_kf(kf_dir, ts)
            if self.seg_cap is None:
                N_i = kf.regions.shape[0]
                Hg, Wg = kf.regions.shape[1:]
                self.seg_cap = max(64, int(np.ceil(N_i * 1.5 / 32) * 32))
                self.point_cap = int(
                    np.ceil(max(int(kf.regions.sum()) * 2, Hg * Wg) / 1024) * 1024
                )
                self.buffers = window.empty_window(
                    self.window_size, self.supp_cap, kf.image.shape[:2],
                    kf.image.shape[2], self.seg_cap, self.point_cap,
                )
                self.supp_valid_host = np.zeros(
                    (self.window_size, self.supp_cap), bool
                )
            bundle = build_bundle_np(
                kf.regions, kf.logdepth_perseg, capacity=self.point_cap
            )
            n = kf.regions.shape[0]
            kp_base = kf.logdepth_perseg[
                np.arange(n), kf.keypoints_rc[:, 0], kf.keypoints_rc[:, 1]
            ]
            self.buffers = window.set_keyframe_slot(
                self.buffers, self.num_kfs, kf.image, kf.K, kf.pose,
                kf.kp_logdepth, kf.affine, np.asarray(bundle.uv),
                np.asarray(bundle.seg_id), np.asarray(bundle.base_logdepth),
                np.asarray(bundle.valid), int(bundle.num_valid), kp_base,
            )
            self.host_kfs.append(kf)
            self._nvalid_latest = int(bundle.num_valid)  # feeds _point_trim
            self._nvalid_slots.append(int(bundle.num_valid))
            self.num_kfs += 1
        self.current_track = self.host_kfs[-1].pose.copy()
        self.current_aff = self.host_kfs[-1].affine.copy()
        self.current_ts = self.host_kfs[-1].timestamp
        self.initialised = len(self.host_kfs) >= 2
        return frame_id

    # ------------------------------------------------------------ main loop
    def run(self, max_frames: Optional[int] = None):
        start_id = self.config.dataset.start_id
        if self.config.restore is not None:
            resume_id = self.load_state(
                self.config.restore.path, self.config.restore.frame_id
            )
            start_id = resume_id
        else:
            frame0 = self.dataset[start_id]
            ts0 = self.id_to_timestamp(start_id)
            self.frame_timestamps[ts0] = float(frame0.get("timestamp", start_id))
            pose0 = np.asarray(frame0["T"], np.float32)
            self.current_track = pose0
            self.init_keyframe(frame0, pose0, ts0)

        end = len(self.dataset) if max_frames is None else min(
            len(self.dataset), start_id + max_frames
        )
        for frame_id in range(start_id + 1, end):
            frame = self.dataset[frame_id]
            timestamp = self.id_to_timestamp(frame_id)
            self.frame_timestamps[timestamp] = float(frame.get("timestamp", frame_id))
            if self._fused_enabled():
                self.fused_frame(frame, timestamp)
            else:
                self.track_frame(frame, timestamp)
                if self.initialised and self.config.alignment.mapping.continual_steps > 0:
                    self.mapping(self.config.alignment.mapping.continual_steps, mode="supp")

            if self.mapping_scheduled:
                i = self.num_kfs - 1
                if int(self.supp_valid_host[i].sum()) >= 2:
                    self.mapping(self.config.alignment.mapping.steps, mode="map")
                    self.mapping_scheduled = False
                    self.tracked = []
                    self.buffers = window.clear_supporting(self.buffers, i)
                    self.supp_valid_host[i] = False

            kf_flag, _ = self.is_kf(timestamp)
            if kf_flag:
                self._flush_tracked_to_prev_kf()
                self.init_keyframe(frame, self.current_track, timestamp)
                self.tracked = []
                if not self.initialised:
                    self.mapping(self.config.alignment.mapping.init_steps, mode="init")
                else:
                    self.mapping_scheduled = True

            if (
                frame_id > 0
                and self.config.save_every > 0
                and frame_id % self.config.save_every == 0
            ):
                self.save_state()

            if self.live_cb is not None:
                # live viz hook (viz/live.py): publish a snapshot and honor
                # the pause marker — the reference GUI's per-iteration view
                # + pause toggle (gui/odometery_gui.py:393-422)
                self.live_cb(self, frame_id)

        traj_dir = self.config.save_path + "/traj"
        io.save_trajectory(traj_dir, self.global_kf_trajectory, "final")
        io.save_trajectory(
            traj_dir, self.global_track_trajectory, "final", name="track_traj"
        )
        if self.config.save_every > 0:
            self.save_state()
        print("\n[timing]\n" + self.timer.report(), flush=True)
        return self.global_kf_trajectory
