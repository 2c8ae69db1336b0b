"""Manifold (retraction) Adam, fully on-device as ``lax.scan``.

Reference semantics being reproduced (SURVEY §7.3.6):
  - parameters are per-frame SE(3) tangent deltas, per-segment scalar
    log-depths and per-frame affine brightness 2-vectors;
  - torch.optim.Adam with per-group learning rates
    (two_frame_sfm.py:117-121; odometery.py:301-310, 576-585);
  - **fold mode** (tracking/mapping): every step the delta is folded into the
    pose (pose <- pose @ exp(delta)), renormalized via the quaternion round
    trip, and the delta re-zeroed while its Adam moments persist
    (odometery.py:400-403, 860-882).  Equivalently: gradients are always
    evaluated at delta = 0.
  - **accumulate mode** (two-frame SfM): the tangent parameter accumulates
    across steps around a fixed base pose (lietorch LieGroupParameter,
    two_frame_sfm.py:83), pose = base @ exp(xi).

optax.adam matches torch.optim.Adam bit-for-bit in update law
(b1=0.9, b2=0.999, eps=1e-8 outside the sqrt, bias correction).

The whole loop lives in one jit: loss/grad/update/retraction scanned for a
static number of steps — zero host round-trips per iteration (the reference
pays a GPU->CPU viz copy every iteration, two_frame_sfm.py:175-183).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..lie import se3


class OptParams(NamedTuple):
    """Optimizable state. ``poses`` are (B, 4, 4) group elements; ``xi`` the
    (B, 6) tangent params (zero in fold mode); ``kp_logdepth`` (N,) per-segment
    scalars; ``affine`` (B, 2) or a (0, 2) placeholder when disabled."""

    poses: jax.Array
    xi: jax.Array
    kp_logdepth: jax.Array
    affine: jax.Array


def make_optimizer(
    lr_depth: float, lr_pose: float, lr_affine: float = 0.0
) -> optax.GradientTransformation:
    """Per-group Adam (reference lrs: depth 1e-3, pose 1e-2 in SfM,
    two_frame_sfm.py:117-121; tracking pose 3e-3 'lr', affine 5e-3,
    odometery.py:301-307; mapping logdepth/pose/affine lrs from config,
    odometery.py:576-585)."""
    return optax.multi_transform(
        {
            "xi": optax.adam(lr_pose),
            "kp_logdepth": optax.adam(lr_depth),
            "affine": optax.adam(lr_affine) if lr_affine > 0 else optax.set_to_zero(),
        },
        param_labels=OptParams(
            poses="xi", xi="xi", kp_logdepth="kp_logdepth", affine="affine"
        ),
    )


class SolveResult(NamedTuple):
    params: OptParams
    opt_state: Any
    losses: jax.Array  # (num_steps,)


def run_adam(
    loss_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    params: OptParams,
    optimizer: optax.GradientTransformation,
    opt_state: Any,
    num_steps: int,
    fold: bool = True,
    pose_update_mask: Optional[jax.Array] = None,
    skip_first_step: bool = False,
) -> SolveResult:
    """Scan ``num_steps`` of retraction-Adam.

    ``loss_fn(poses, kp_logdepth, affine) -> scalar`` with
    poses = params.poses @ exp(xi) supplied by the runner.

    ``pose_update_mask`` (B,) zeroes pose updates for gauge-frozen frames
    (the reference freezes the first window KF, odometery.py:591-598).
    ``skip_first_step`` reproduces the reference's viz-only first iteration
    (two_frame_sfm.py:203-207).
    """

    def total_loss(p: OptParams) -> jax.Array:
        poses = jnp.matmul(
            p.poses, se3.exp(p.xi), precision=jax.lax.Precision.HIGHEST
        )
        return loss_fn(poses, p.kp_logdepth, p.affine)

    def step(carry, i):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(total_loss)(p)
        grads = grads._replace(poses=jnp.zeros_like(p.poses))
        updates, new_opt_state = optimizer.update(grads, opt_state, p)
        if pose_update_mask is not None:
            m = pose_update_mask[:, None]
            updates = updates._replace(xi=updates.xi * m)

        # The reference's first SfM iteration is viz-only: no backward, no
        # step, no moment update (two_frame_sfm.py:203-207).
        do_update = jnp.logical_or(jnp.asarray(not skip_first_step), i > 0)
        updates = jax.tree.map(lambda u: u * do_update.astype(u.dtype), updates)
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(do_update, new, old), opt_state, new_opt_state
        )

        new_xi = p.xi + updates.xi
        if fold:
            poses = jax.vmap(se3.retract)(p.poses, new_xi)
            new_xi = jnp.zeros_like(new_xi)
        else:
            poses = p.poses
        p = OptParams(
            poses=poses,
            xi=new_xi,
            kp_logdepth=p.kp_logdepth + updates.kp_logdepth,
            affine=p.affine + updates.affine,
        )
        return (p, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), jnp.arange(num_steps)
    )
    return SolveResult(params=params, opt_state=opt_state, losses=losses)


def final_poses(params: OptParams) -> jax.Array:
    """Pose estimates including any unfolded accumulated tangent."""
    return jnp.matmul(
        params.poses, se3.exp(params.xi), precision=jax.lax.Precision.HIGHEST
    )
