"""Frame-to-keyframe tracking (reference: odometery/odometery.py:323-448).

Per incoming frame: optimize an SE(3) delta (and optionally a 2-vector
affine) aligning the latest keyframe's precomputed unprojection against the
new frame's image, with Adam over a coarse-to-fine image pyramid with
per-level step counts (steps [0, 0, 300] in the TUM configs — only the
finest level actually iterates).

Semantics:
  - the cost pose is ``exp(delta) @ R`` with R = inv(T_frame) @ T_kf — the
    delta multiplies on the LEFT of the relative pose (odometery.py:391-394);
    after each step the delta folds into the tracked world pose and
    re-zeroes (:400-403); final renormalization (:407);
  - source samples precomputed once per level with no grad (:365-369);
  - Adam lrs: delta from config track.lr, affine hardcoded 5e-3 (:301-307);
  - the convergence flag exists but is never set (SURVEY §2.4) — fixed
    iteration counts.

The per-level loop is one jitted scan; host sees only the final pose.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..cost import photometric as ph
from ..keyframe import PointBundle
from ..lie import se3


class TrackState(NamedTuple):
    R: jax.Array          # (4, 4) relative pose inv(T_frame) @ T_kf
    affine: jax.Array     # (2,) frame affine
    opt_state: object


class TrackResult(NamedTuple):
    R: jax.Array
    affine: jax.Array
    losses: jax.Array


def make_track_optimizer(lr_pose: float, lr_affine: float = 5e-3):
    return optax.multi_transform(
        {"xi": optax.adam(lr_pose), "affine": optax.adam(lr_affine)},
        param_labels={"xi": "xi", "affine": "affine"},
    )


@functools.partial(jax.jit, static_argnames=("geo_dims", "num_steps", "use_affine"))
def track_level(
    bundle: PointBundle,
    src_samples: ph.SourceSamples,
    trg_image: jax.Array,
    K: jax.Array,
    kp_logdepth: jax.Array,
    kp_base: jax.Array,
    R0: jax.Array,
    affine0: jax.Array,
    kf_affine: jax.Array,
    opt_state,
    optimizer_lr_pose: jax.Array,
    optimizer_lr_affine: jax.Array,
    geo_dims: tuple[int, int],
    num_steps: int,
    use_affine: bool,
) -> tuple[jax.Array, jax.Array, object, jax.Array]:
    """Scan ``num_steps`` tracking iterations at one pyramid level.

    Traced lrs scale ``scale_by_adam`` directions (linear in lr), so every
    level/config shares one compilation per shape.
    """
    opt = optax.scale_by_adam()

    def loss_fn(xi, affine, R):
        pose = jnp.matmul(se3.exp(xi), R, precision=jax.lax.Precision.HIGHEST)
        aff = (kf_affine, affine) if use_affine else None
        return ph.photometric_cost(
            bundle, src_samples, trg_image, K, geo_dims,
            kp_logdepth, kp_base, pose, affine=aff,
        )

    def step(carry, _):
        R, affine, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p["xi"], p["affine"], R)
        )({"xi": jnp.zeros(6), "affine": affine})
        direction, opt_state = opt.update(grads, opt_state)
        xi_upd = -optimizer_lr_pose * direction["xi"]
        aff_upd = -optimizer_lr_affine * direction["affine"]
        R = jnp.matmul(se3.exp(xi_upd), R, precision=jax.lax.Precision.HIGHEST)
        affine = affine + aff_upd * (1.0 if use_affine else 0.0)
        return (R, affine, opt_state), loss

    if opt_state is None:
        opt_state = opt.init({"xi": jnp.zeros(6), "affine": affine0})

    (R, affine, opt_state), losses = jax.lax.scan(
        step, (R0, affine0, opt_state), None, length=num_steps
    )
    return R, affine, opt_state, losses


@functools.partial(
    jax.jit,
    static_argnames=(
        "geo_dims", "steps", "use_affine", "pyramid_min", "pyramid_max"
    ),
)
def track_frame_fused(
    bundle: PointBundle,
    kf_image_pyr: tuple,
    trg_image: jax.Array,
    K: jax.Array,
    kp_logdepth: jax.Array,
    kp_base: jax.Array,
    T_kf: jax.Array,
    T_init: jax.Array,
    kf_affine: jax.Array,
    affine_init: jax.Array,
    lr_pose: jax.Array,
    lr_affine: jax.Array,
    geo_dims: tuple[int, int],
    steps: tuple[int, ...],
    pyramid_min: int,
    pyramid_max: int,
    use_affine: bool,
):
    """One-dispatch Adam tracking: target pyramid build + per-level source
    precompute + all level scans fused into a single jit.

    Numerically identical to :func:`track_frame` (same composed functions);
    exists because the eager per-frame path pays ~6 small relay dispatches
    (pyramid blur/slice, per-level precompute) + two fetches — measured at
    892 ms/frame in the round-4 e2e driver vs 307 ms device for the same
    300-iter schedule.  Returns a packed (19,) f32 vector:
    [T_frame(16), affine(2), final_loss(1)] — ONE fetch on the host side.
    """
    from ..image import pyramid as pyr

    trg_pyr = pyr.image_pyramid(trg_image, pyramid_min, pyramid_max)
    R = jnp.matmul(
        se3.inverse(T_init), T_kf, precision=jax.lax.Precision.HIGHEST
    )
    affine = affine_init
    opt_state = None
    final_loss = jnp.float32(jnp.nan)
    for level, n in enumerate(steps):
        if n <= 0:
            continue
        src = ph.precompute_source(kf_image_pyr[level], bundle, geo_dims)
        R, affine, opt_state, losses = track_level(
            bundle, src, trg_pyr[level], K, kp_logdepth, kp_base,
            R, affine, kf_affine, opt_state, lr_pose, lr_affine,
            geo_dims, int(n), bool(use_affine),
        )
        final_loss = losses[-1]
    T_frame = se3.renormalize(
        jnp.matmul(T_kf, se3.inverse(R), precision=jax.lax.Precision.HIGHEST)
    )
    return jnp.concatenate(
        [T_frame.reshape(16), affine, final_loss[None]]
    ).astype(jnp.float32)


def track_frame(
    bundle: PointBundle,
    kf_image_pyr: list[jax.Array],
    trg_image_pyr: list[jax.Array],
    K: jax.Array,
    kp_logdepth: jax.Array,
    kp_base: jax.Array,
    T_kf: jax.Array,
    T_init: jax.Array,
    kf_affine: jax.Array,
    affine_init: jax.Array,
    geo_dims: tuple[int, int],
    steps: tuple[int, ...],
    lr_pose: float,
    lr_affine: float = 5e-3,
    use_affine: bool = False,
):
    """Full coarse-to-fine tracking of one frame.

    ``*_pyr`` lists are coarsest-first and must match ``steps`` length.
    Returns (T_frame (4,4) world pose, affine (2,), per-level losses).
    """
    R = jnp.matmul(
        se3.inverse(T_init), T_kf, precision=jax.lax.Precision.HIGHEST
    )
    affine = affine_init
    opt_state = None
    all_losses = []
    for level, n in enumerate(steps):
        if n <= 0:
            continue
        src = ph.precompute_source(kf_image_pyr[level], bundle, geo_dims)
        R, affine, opt_state, losses = track_level(
            bundle, src, trg_image_pyr[level], K, kp_logdepth, kp_base,
            R, affine, kf_affine, opt_state,
            jnp.asarray(lr_pose), jnp.asarray(lr_affine),
            geo_dims, int(n), bool(use_affine),
        )
        all_losses.append(losses)

    # T_frame = T_kf @ inv(R), renormalized once at the end (odometery.py:407)
    T_frame = se3.renormalize(
        jnp.matmul(T_kf, se3.inverse(R), precision=jax.lax.Precision.HIGHEST)
    )
    return T_frame, affine, all_losses
