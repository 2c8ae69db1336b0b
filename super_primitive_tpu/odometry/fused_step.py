"""Fused per-frame odometry step — ONE device dispatch per tracked frame.

The reference's per-frame loop (odometery/odometery.py:1030-1054) issues
many separate GPU stages: tracking, tracked-pose->supporting bookkeeping,
per-frame 'supp' logdepth refinement, and keyframe gating.  The round-1
rebuild mirrored that as 10-15 jit dispatches/frame, which costs ~32 ms of
relay RTT each under the axon tunnel (and real dispatch overhead on any
host).  This module fuses the whole steady-state frame into a single jitted
program:

  1. coarse-to-fine GN/LM tracking against the newest keyframe
     (solve/gauss_newton.gn_track, pyramids built in-graph);
  2. supporting-slot refresh: the previous and current tracked frames
     become the newest KF's supporting slots (odometery.py:1272-1290);
  3. per-frame 'supp' logdepth GN refinement (odometery.py:605-629);
  4. keyframe-gating metrics (odometery.py:986-1016) at the refined state.

Host transfers per frame: one image upload, one fused dispatch, one packed
scalar fetch.  The keyframe-cadence work (window mapping, KF init) stays in
its own dispatches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..cost import photometric as ph
from ..geometry import projection
from ..image import pyramid as pyr
from ..lie import se3
from ..ops.scatter import render_depth
from ..solve.gauss_newton import gn_track_frame
from . import kf_criteria
from .mapper import run_supp_refinement_gn
from .window import WindowBuffers


@functools.partial(
    jax.jit,
    static_argnames=(
        "geo_dims", "levels", "pyramid_min", "pyramid_max",
        "max_iters", "use_affine", "supp_max_iters", "do_supp",
        "point_trim",
    ),
)
def fused_frame_step(
    buffers: WindowBuffers,
    kf_slot: jax.Array,        # () int32 — newest KF slot
    trg_image: jax.Array,      # (H, W, C) current frame
    T_init: jax.Array,         # (4, 4) tracking initialization
    current_aff: jax.Array,    # (2,) tracking affine initialization
    prev_img: jax.Array,       # (H, W, C) previous tracked frame image
    prev_pose: jax.Array,      # (4, 4)
    prev_aff: jax.Array,       # (2,)
    prev_valid: jax.Array,     # () bool — a previous tracked frame exists
    supp_trg_index: jax.Array, # (T_max,) supp-refinement targets (pool idx)
    supp_trg_valid: jax.Array, # (T_max,)
    geo_dims: tuple[int, int],
    levels: tuple[int, ...],   # active pyramid list indices (coarsest-first)
    pyramid_min: int,
    pyramid_max: int,
    max_iters: int = 20,
    use_affine: bool = False,
    supp_max_iters: int = 6,
    do_supp: bool = True,
    point_trim: int | None = None,
):
    """Returns (new_buffers, packed (22,), kp_logdepth_row (N,)).

    ``packed`` = [T_frame.ravel() (16), affine (2), validity_ratio,
    trans_diff, median_scale, track_cost] — one host fetch covers all the
    per-frame control-flow inputs.
    """
    i = kf_slot
    bundle = buffers.bundle_at(i, trim=point_trim)
    T_kf = buffers.poses[i]
    kf_affine = buffers.affine[i]
    kp_ld = buffers.kp_logdepth[i]
    kp_base = buffers.kp_base[i]
    K = buffers.K[i]

    # ---- 1. coarse-to-fine GN tracking (the same gn_track_frame the
    # unfused path uses — one copy of the level loop to keep in sync) ------
    kf_pyr = pyr.image_pyramid(buffers.images[i], pyramid_min, pyramid_max)
    trg_pyr = pyr.image_pyramid(trg_image, pyramid_min, pyramid_max)
    T_frame, affine, infos = gn_track_frame(
        bundle, kf_pyr, trg_pyr, K, kp_ld, kp_base,
        T_kf, T_init, kf_affine, current_aff, geo_dims,
        levels=list(levels), max_iters=max_iters, use_affine=use_affine,
    )
    track_cost = infos[-1].final_cost if infos else jnp.zeros(())

    # ---- 2. supporting-slot refresh (last two tracked frames) ------------
    # slot layout matches _refresh_latest_supp_from_tracked: with a previous
    # tracked frame, slots = [prev, current]; on the first frame after a KF,
    # slot 0 holds the current frame alone.
    pv = prev_valid
    img0 = jnp.where(pv, prev_img, trg_image)
    pose0 = jnp.where(pv, prev_pose, T_frame)
    aff0 = jnp.where(pv, prev_aff, affine)
    S = buffers.supp_capacity
    supp_valid_row = jnp.zeros((S,), bool).at[0].set(True).at[1].set(pv)
    buffers = buffers.replace(
        supp_images=buffers.supp_images.at[i, 0].set(img0).at[i, 1].set(trg_image),
        supp_poses=buffers.supp_poses.at[i, 0].set(pose0).at[i, 1].set(T_frame),
        supp_affine=buffers.supp_affine.at[i, 0].set(aff0).at[i, 1].set(affine),
        supp_valid=buffers.supp_valid.at[i].set(supp_valid_row),
    )

    # ---- 3. per-frame 'supp' logdepth refinement --------------------------
    if do_supp:
        ld_row, _ = run_supp_refinement_gn(
            buffers, i, supp_trg_index, supp_trg_valid,
            use_affine, geo_dims, max_iters=supp_max_iters,
            point_trim=point_trim,
        )
        buffers = buffers.replace(
            kp_logdepth=buffers.kp_logdepth.at[i].set(ld_row)
        )
    else:
        ld_row = kp_ld

    # ---- 4. keyframe-gating metrics at the refined state ------------------
    logd = ph.spread_logdepth(bundle, ld_row, kp_base)
    pts = projection.unproject(bundle.uv, jnp.exp(logd), K)
    delta = jnp.matmul(
        se3.inverse(T_frame), buffers.poses[i],
        precision=jax.lax.Precision.HIGHEST,
    )
    pts = projection.transform(pts, delta)
    depth, _ = render_depth(pts, K, geo_dims, valid=bundle.valid)
    validity_ratio = jnp.mean((depth > 1e-6).astype(jnp.float32))
    diff, scale = kf_criteria.translation_difference(
        T_frame, buffers.poses[i], depth
    )

    packed = jnp.concatenate([
        T_frame.ravel(), affine,
        jnp.stack([validity_ratio, diff, scale, track_cost]),
    ])
    return buffers, packed, ld_row
