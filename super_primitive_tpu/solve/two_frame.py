"""Headless two-frame SfM driver (workload #1).

Reference: odometery/two_frame_sfm.py — joint optimization of per-segment
log-depths (lr 1e-3) and supporting-frame SE(3) poses (lr 1e-2, lietorch
tangent accumulation) against per-support photometric costs, summed, over a
coarse-to-fine pyramid with 500 iterations per level (:117-121, :150-207).
Depth seeds are random 2 + 2*rand in log space (:103-105); supporting poses
init from GT with exp-noise sigma 0.05 (:73-84); the very first iteration is
viz-only (no optimizer step, :203-207).

TPU-native structure: per pyramid level one jitted ``lax.scan`` runs the full
iteration budget on device; Adam state persists across levels (the reference
builds its optimizer once).  The per-iteration GPU->CPU viz push of the
reference is replaced by the scanned loss history plus optional final aux.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..cost import photometric as ph
from ..keyframe import KeyFramePyramid
from .retraction_adam import (
    OptParams,
    SolveResult,
    final_poses,
    make_optimizer,
    run_adam,
)


@dataclasses.dataclass(frozen=True)
class TwoFrameConfig:
    num_iters: int = 500           # per level (two_frame_sfm.py:128)
    lr_depth: float = 1e-3         # :117
    lr_pose: float = 1e-2          # :119
    depth_seed_low: float = 2.0    # seeds 2 + 2*rand (:103-105)
    depth_seed_high: float = 4.0
    pose_noise_sigma: float = 0.05  # :80


def random_depth_seeds(key: jax.Array, num_segments: int, cfg: TwoFrameConfig) -> jax.Array:
    """Log of uniform [low, high) depth seeds (two_frame_sfm.py:103-105)."""
    d = jax.random.uniform(
        key, (num_segments,), minval=cfg.depth_seed_low, maxval=cfg.depth_seed_high
    )
    return jnp.log(d)


def solve_two_frame(
    src_pyr: KeyFramePyramid,
    supp_pyrs: Sequence[KeyFramePyramid],
    init_poses: jax.Array,
    init_kp_logdepth: jax.Array,
    cfg: TwoFrameConfig = TwoFrameConfig(),
    loss_history: bool = True,
):
    """Run coarse-to-fine joint pose+depth optimization.

    ``init_poses`` is (B, 4, 4) T_support_from_src for each supporting frame.
    Returns (poses (B, 4, 4), kp_logdepth (N,), losses list per level).
    """
    bundle = src_pyr.bundle
    geo = src_pyr.geo
    assert bundle is not None and geo is not None
    kp_base = geo.keypoint_base_logdepth()
    geo_dims = geo.geo_dims
    K = src_pyr.K
    B = init_poses.shape[0]

    optimizer = make_optimizer(cfg.lr_depth, cfg.lr_pose)
    params = OptParams(
        poses=init_poses,
        xi=jnp.zeros((B, 6)),
        kp_logdepth=init_kp_logdepth,
        affine=jnp.zeros((B, 2)),
    )
    opt_state = optimizer.init(params)

    num_levels = src_pyr.num_levels
    all_losses = []

    @functools.partial(jax.jit, static_argnums=(4,))
    def solve_level(params, opt_state, src_samples, trg_images, skip_first):
        def loss_fn(poses, kp_logdepth, affine):
            def per_supp(trg_image, pose):
                return ph.photometric_cost(
                    bundle, src_samples, trg_image, K, geo_dims,
                    kp_logdepth, kp_base, pose,
                )
            residuals = jax.vmap(per_supp)(trg_images, poses)
            # reference: loss = sum_b mean(|residual_b|); residuals are
            # already scalars (two_frame_sfm.py:201-202)
            return jnp.sum(jnp.abs(residuals))

        return run_adam(
            loss_fn, params, optimizer, opt_state, cfg.num_iters,
            fold=False, skip_first_step=skip_first,
        )

    for level in range(num_levels):
        src_samples = ph.precompute_source(src_pyr.images[level], bundle, geo_dims)
        trg_images = jnp.stack([p.images[level] for p in supp_pyrs])
        result: SolveResult = solve_level(
            params, opt_state, src_samples, trg_images, level == 0
        )
        params, opt_state = result.params, result.opt_state
        if loss_history:
            all_losses.append(result.losses)

    return final_poses(params), params.kp_logdepth, all_losses
