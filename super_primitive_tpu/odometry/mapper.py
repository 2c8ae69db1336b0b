"""Windowed mapping: joint refinement of keyframe log-depths, poses and
affine parameters over chain connectivity with supporting frames.

Reference: odometery/odometery.py:687-985 (``mapping``), :576-650
(``setup_mapping_opt``), :451-530 (connectivity + target collection).

Semantics reproduced:
  - modes: 'init' (first mapping), 'map' (scheduled), 'supp' (per-frame
    newest-KF logdepth refinement);
  - per-group Adam lrs: logdepth 1e-2; pose 1e-2 for mono init else 1e-4;
    affine 1e-5 (odometery.py:578-585);
  - first window KF pose ALWAYS frozen; its logdepth frozen when the window
    is full (gauge fixing, :591-598); 'supp' optimizes only the newest KF's
    logdepth with no pose/affine params (:605-629);
  - connectivity: chain +-1; supporting frames of src and src-1 attach as
    extra targets (:459-479, :666-677); 'supp' restricts sources to the
    newest KF (:469-470);
  - cost pose composition per (src s, trg t):
    rel = inv(T_t exp(xi_t)) @ (T_s exp(xi_s)) — the reference's
    delta_t @ inv(T_t) @ T_s @ inv(delta_s) (:788, under delta -> -xi);
  - per step: fold xi into pose with quaternion renormalization, re-zero,
    Adam moments persist (:860-882);
  - loss = sum over sources of mean over that source's targets (:845-850);
  - early stop on relative loss change < 1e-8 once initialised (:907-915).

TPU structure: everything above is ONE jitted ``lax.while_loop`` over fixed
(W, S, T_max) slot arrays with validity masks; mode differences are traced
masks/lrs, so all three modes share a single compilation.  Learning rates
apply as traced multipliers on ``scale_by_adam`` directions (Adam is linear
in lr), avoiding recompilation per mode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cost import photometric as ph
from ..keyframe import PointBundle
from ..lie import se3
from .window import WindowBuffers


class MapSlots(NamedTuple):
    """Static-shape connectivity: for each source KF slot, up to T_max
    targets indexed into the unified pose table (KFs first, then supporting
    frames flattened), plus masks.  Built host-side per mapping call."""

    trg_index: np.ndarray     # (W, T_max) int32 into [0, W + W*S)
    trg_valid: np.ndarray     # (W, T_max) bool
    src_valid: np.ndarray     # (W,) bool — sources participating


class MapMasks(NamedTuple):
    xi_mask: np.ndarray       # (B,) float — pose tangent update mask
    ld_mask: np.ndarray       # (W,) float — logdepth update mask
    affine_mask: np.ndarray   # (B,) float


class MapParams(NamedTuple):
    poses: jax.Array          # (B, 4, 4) unified: W KFs then W*S supp
    xi: jax.Array             # (B, 6)
    kp_logdepth: jax.Array    # (W, N)
    affine: jax.Array         # (B, 2)


def build_slots(
    num_kfs: int, window_cap: int, supp_valid: np.ndarray, mode: str
) -> MapSlots:
    """Host-side connectivity construction (odometery.py:451-530)."""
    W = window_cap
    S = supp_valid.shape[1]
    T_max = 2 + 2 * S
    trg_index = np.zeros((W, T_max), np.int32)
    trg_valid = np.zeros((W, T_max), bool)
    src_valid = np.zeros((W,), bool)

    def supp_flat(i, j):
        return W + i * S + j

    for src in range(num_kfs):
        if mode == "supp" and src != num_kfs - 1:
            continue
        slots = []
        if src > 0:
            slots.append(src - 1)
        if src < num_kfs - 1:
            slots.append(src + 1)
        for s_src in ([src, src - 1] if src > 0 else [src]):
            for j in range(S):
                if supp_valid[s_src, j]:
                    slots.append(supp_flat(s_src, j))
        if not slots:
            continue
        src_valid[src] = True
        trg_index[src, : len(slots)] = slots
        trg_valid[src, : len(slots)] = True
    # Trim trailing all-invalid slot columns.  The solvers gather/warp P
    # bundle points per (source, slot) REGARDLESS of trg_valid (static
    # shapes), so padding columns are pure wasted gather rows — 67% of the
    # linearization's rows in a chain-only window (2 valid of 2+2S columns).
    # Slots are front-packed per source, so slicing columns loses nothing.
    # Bucket the kept count to even values so the jitted solvers see at most
    # T_max/2 distinct shapes across window states (bounded recompiles).
    used = int(trg_valid.any(axis=0).sum())
    keep = 1 if used == 0 else min(T_max, used + (used % 2))
    return MapSlots(
        trg_index=np.ascontiguousarray(trg_index[:, :keep]),
        trg_valid=np.ascontiguousarray(trg_valid[:, :keep]),
        src_valid=src_valid,
    )


def build_masks(
    num_kfs: int,
    window_cap: int,
    supp_valid: np.ndarray,
    mode: str,
    window_size: int,
    opt_supporting: bool,
    affine_compensation: bool,
) -> MapMasks:
    """Which parameters move, per mode (odometery.py:576-650)."""
    W = window_cap
    S = supp_valid.shape[1]
    B = W + W * S
    xi = np.zeros(B, np.float32)
    ld = np.zeros(W, np.float32)
    aff = np.zeros(B, np.float32)

    if mode == "supp":
        if num_kfs > 0:
            ld[num_kfs - 1] = 1.0
    else:
        # KF poses: 1..num_kfs-1 (first always frozen, :591-592)
        xi[1:num_kfs] = 1.0
        # logdepths: first frozen only when the window is full (:594-598)
        start = 1 if num_kfs == window_size else 0
        ld[start:num_kfs] = 1.0
        if affine_compensation:
            aff[1:num_kfs] = 1.0
        if opt_supporting:
            for i in range(num_kfs):
                for j in range(S):
                    if supp_valid[i, j]:
                        xi[W + i * S + j] = 1.0
                        if affine_compensation:
                            aff[W + i * S + j] = 1.0
    return MapMasks(xi_mask=xi, ld_mask=ld, affine_mask=aff)


class MapResult(NamedTuple):
    params: MapParams
    losses: jax.Array         # (max_iters,) loss history (0 after early stop)
    num_iters: jax.Array      # () actual iterations run


@functools.partial(
    jax.jit,
    static_argnames=("geo_dims", "use_affine", "point_trim"),
    donate_argnums=(),
)
def run_mapping(
    buffers: WindowBuffers,
    trg_index: jax.Array,       # (W, T_max)
    trg_valid: jax.Array,       # (W, T_max)
    src_valid: jax.Array,       # (W,)
    xi_mask: jax.Array,         # (B,)
    ld_mask: jax.Array,         # (W,)
    affine_mask: jax.Array,     # (B,)
    lr_pose: jax.Array,
    lr_logdepth: jax.Array,
    lr_affine: jax.Array,
    max_iters: jax.Array,
    early_stop: jax.Array,      # bool — enable 1e-8 relative stopping
    use_affine: bool,           # static — affine compensation active
    geo_dims: tuple[int, int],
    drag_supporting: jax.Array = np.float32(0.0),  # 1.0 when opt_supporting
                                # is OFF: supporting poses follow their
                                # source KF's update (odometery.py:873-877)
    point_trim: int | None = None,  # static point-axis slice — exact for
                                # any trim >= every slot's num_valid (see
                                # WindowBuffers.bundle_at)
) -> MapResult:
    """One fully-on-device mapping solve.  See module docstring."""
    if point_trim is not None:
        buffers = buffers.replace(
            uv=buffers.uv[:, :point_trim],
            seg_id=buffers.seg_id[:, :point_trim],
            base_logdepth=buffers.base_logdepth[:, :point_trim],
            point_valid=buffers.point_valid[:, :point_trim],
        )
    W = buffers.capacity
    S = buffers.supp_capacity
    B = W + W * S
    T_max = trg_index.shape[1]
    # pool entry -> owning keyframe slot (KFs own themselves)
    kf_of = jnp.concatenate([jnp.arange(W), jnp.repeat(jnp.arange(W), S)])
    is_supp = jnp.arange(B) >= W

    # --- unified pose/affine tables: KFs then flattened supp slots ---
    params = MapParams(
        poses=buffers.pose_pool(),
        xi=jnp.zeros((B, 6)),
        kp_logdepth=buffers.kp_logdepth,
        affine=buffers.affine_pool(),
    )

    # --- per-source precomputation (constant during optimization) ---
    trg_images = buffers.image_pool()[trg_index]  # (W, T_max, H, Wd, C)
    src_samples = buffers.source_samples(geo_dims)  # leading (W,) axis

    max_hist = 2048  # loss history ring (init mapping uses <= 1000 iters)

    opt = optax.scale_by_adam()
    opt_state = opt.init(params)

    def total_loss(p: MapParams) -> jax.Array:
        # poses only move through xi (grads.poses was zeroed anyway);
        # stop_gradient lets XLA drop that whole backward branch
        E = jnp.matmul(
            jax.lax.stop_gradient(p.poses), se3.exp(p.xi),
            precision=jax.lax.Precision.HIGHEST,
        )

        # lax.scan over sources, NOT vmap: under vmap the segment-sum in
        # the backward (one-hot MXU contraction, cost/photometric.py)
        # batches into a (W, N, P) ~ 590 MB materialization — the same
        # vmap-vs-scan cliff measured for the GN assemble (NOTES r2).
        # scan keeps it (N, P) per step.
        def per_src(acc, i):
            bundle = buffers.bundle_at(i)
            src = ph.SourceSamples(
                pixels=src_samples.pixels[i], valid=src_samples.valid[i]
            )
            idx = trg_index[i]
            rel = jnp.matmul(
                se3.inverse(E[idx]), E[i], precision=jax.lax.Precision.HIGHEST
            )
            res = ph.photometric_cost_batch(
                bundle, src, trg_images[i], buffers.K[i], geo_dims,
                p.kp_logdepth[i], buffers.kp_base[i], rel,
                affine=(p.affine[i], p.affine[idx]) if use_affine else None,
            )
            v = trg_valid[i].astype(res.dtype)
            per = jnp.sum(res * v) / jnp.maximum(jnp.sum(v), 1.0)
            return acc + per * src_valid[i].astype(per.dtype), None

        out, _ = jax.lax.scan(per_src, jnp.zeros(()), jnp.arange(W))
        return out

    def step(carry):
        p, opt_state, it, prev_loss, done, losses = carry
        loss, grads = jax.value_and_grad(total_loss)(p)
        grads = grads._replace(poses=jnp.zeros_like(p.poses))
        direction, opt_state = opt.update(grads, opt_state)

        upd_xi = -lr_pose * direction.xi * xi_mask[:, None]
        upd_ld = -lr_logdepth * direction.kp_logdepth * ld_mask[:, None]
        upd_aff = -lr_affine * direction.affine * affine_mask[:, None]

        # opt_supporting=False: supporting frames stay rigidly attached to
        # their source keyframe (reference supp @= inv(kf_delta),
        # odometery.py:873-877) instead of being frozen in the world frame
        upd_xi = jnp.where(
            (is_supp & (drag_supporting > 0))[:, None], upd_xi[kf_of], upd_xi
        )

        new_poses = jax.vmap(se3.retract)(p.poses, upd_xi)
        p = MapParams(
            poses=new_poses,
            xi=jnp.zeros_like(p.xi),
            kp_logdepth=p.kp_logdepth + upd_ld,
            affine=p.affine + upd_aff,
        )
        rel_change = jnp.abs(loss - prev_loss) / jnp.maximum(prev_loss, 1e-30)
        done = jnp.logical_or(done, jnp.logical_and(early_stop, rel_change < 1e-8))
        losses = losses.at[jnp.minimum(it, max_hist - 1)].set(loss)
        return p, opt_state, it + 1, loss, done, losses

    def cond(carry):
        _, _, it, _, done, _ = carry
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    losses0 = jnp.zeros((max_hist,))
    p, _, iters, _, _, losses = jax.lax.while_loop(
        cond, step, (params, opt_state, jnp.asarray(0), jnp.asarray(jnp.inf), jnp.asarray(False), losses0)
    )
    return MapResult(params=p, losses=losses, num_iters=iters)


@functools.partial(
    jax.jit, static_argnames=("geo_dims", "use_affine", "point_trim")
)
def run_supp_refinement(
    buffers: WindowBuffers,
    src_slot: jax.Array,       # () int32 — the newest KF slot
    trg_index: jax.Array,      # (T_max,) unified pose-table indices
    trg_valid: jax.Array,      # (T_max,)
    lr_logdepth: jax.Array,
    num_iters: jax.Array,
    use_affine: bool,
    geo_dims: tuple[int, int],
    point_trim: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Specialized 'supp' mapping: refine ONLY the newest KF's log-depths
    against its targets (odometery.py:605-629 — no pose/affine params).

    The general run_mapping computes all W sources and masks the rest; this
    path does the single source's work (~W times cheaper), which matters
    because supp refinement runs EVERY frame (continual_steps).

    Returns (kp_logdepth (N,), losses (num_iters<=64,)).
    """
    s = src_slot
    bundle = buffers.bundle_at(s, trim=point_trim)
    src = ph.precompute_source(buffers.images[s], bundle, geo_dims)
    trg_images = buffers.image_pool()[trg_index]
    affine_all = buffers.affine_pool()
    rel = jnp.matmul(
        se3.inverse(buffers.pose_pool()[trg_index]), buffers.poses[s],
        precision=jax.lax.Precision.HIGHEST,
    )
    opt = optax.scale_by_adam()

    def loss_fn(ld):
        res = ph.photometric_cost_batch(
            bundle, src, trg_images, buffers.K[s], geo_dims,
            ld, buffers.kp_base[s], rel,
            affine=(buffers.affine[s], affine_all[trg_index]) if use_affine else None,
        )
        v = trg_valid.astype(res.dtype)
        return jnp.sum(res * v) / jnp.maximum(jnp.sum(v), 1.0)

    def step(carry):
        ld, state, it, losses = carry
        loss, g = jax.value_and_grad(loss_fn)(ld)
        direction, state = opt.update(g, state)
        ld = ld - lr_logdepth * direction
        losses = losses.at[jnp.minimum(it, 63)].set(loss)
        return ld, state, it + 1, losses

    def cond(carry):
        return carry[2] < num_iters

    ld0 = buffers.kp_logdepth[s]
    state0 = opt.init(ld0)
    ld, _, _, losses = jax.lax.while_loop(
        cond, step, (ld0, state0, jnp.asarray(0), jnp.zeros(64))
    )
    return ld, losses


@functools.partial(
    jax.jit,
    static_argnames=("geo_dims", "use_affine", "max_iters", "point_trim"),
)
def run_supp_refinement_gn(
    buffers: WindowBuffers,
    src_slot: jax.Array,
    trg_index: jax.Array,      # (T_max,)
    trg_valid: jax.Array,      # (T_max,)
    use_affine: bool,
    geo_dims: tuple[int, int],
    max_iters: int = 6,
    point_trim: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Newton supp refinement: per-segment scalar log-depths have a DIAGONAL
    normal-equation system (each point touches exactly one scalar), so the
    GN step is elementwise — no linear solve at all.  One forward-mode
    tangent column recovers every per-point partial (the gn_mapping trick);
    IRLS-L1 weights match the Adam path's objective.

    Converges in ~3-6 iterations vs 10 Adam steps, with one linearization
    (~2 forward passes) per iteration.
    """
    s = src_slot
    bundle = buffers.bundle_at(s, trim=point_trim)
    src = ph.precompute_source(buffers.images[s], bundle, geo_dims)
    affine_all = buffers.affine_pool()
    rel = jnp.matmul(
        se3.inverse(buffers.pose_pool()[trg_index]), buffers.poses[s],
        precision=jax.lax.Precision.HIGHEST,
    )
    N = buffers.kp_logdepth.shape[1]
    v_slot = trg_valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(v_slot), 1.0)
    nv = jnp.maximum(bundle.num_valid, 1).astype(jnp.float32)

    from ..geometry import projection
    from ..ops.sampling import bilinear_sample_packed, pack_bilinear_taps

    # single-gather bilinear taps; constant over the solve (hoists out of
    # the Newton while_loop)
    trg_packed = jax.vmap(pack_bilinear_taps)(buffers.image_pool()[trg_index])

    def residuals(ld, shift):
        """(T_max, P, C) residuals with a uniform per-point logdepth tangent."""
        logd = ph.spread_logdepth(bundle, ld, buffers.kp_base[s]) + shift
        pts = projection.unproject(bundle.uv, jnp.exp(logd), buffers.K[s])

        def per_target(img, pose, aff_t):
            pts_t = projection.transform(pts, pose)
            uv_t = projection.project(pts_t, buffers.K[s])
            coords = ph.normalized_image_coords(uv_t, geo_dims)
            px, ok = bilinear_sample_packed(img, coords)
            ok = ok & (jax.lax.stop_gradient(pts_t[..., 2]) > ph.Z_VALID_BATCH)
            if use_affine:
                px = ph.affine_compensate(px, buffers.affine[s], aff_t)
            valid = (src.valid & ok & bundle.valid).astype(px.dtype)
            return (src.pixels[..., :3] - px[..., :3]) * valid[..., None], valid

        return jax.vmap(per_target)(trg_packed, rel, affine_all[trg_index])

    def cost_of(r):
        per = jnp.sum(jnp.abs(r), axis=(1, 2)) / (3.0 * nv)
        return jnp.sum(per * v_slot) / cnt

    def body(state):
        ld, lam, it, cost, done = state
        r0, valid = residuals(ld, jnp.zeros(()))
        j = jax.jacfwd(lambda sh: residuals(ld, sh)[0])(jnp.zeros(()))  # (T,P,C)
        w = v_slot[:, None, None] / jnp.maximum(jnp.abs(r0), 1e-3)
        w = w * valid[..., None] / (3.0 * nv * cnt)
        # diagonal per-segment accumulation
        jtj_pt = jnp.sum(w * j * j, axis=(0, 2))    # (P,)
        jtr_pt = jnp.sum(w * j * r0, axis=(0, 2))   # (P,)
        JtJ = jnp.zeros(N).at[bundle.seg_id].add(jtj_pt)
        Jtr = jnp.zeros(N).at[bundle.seg_id].add(jtr_pt)
        step = -Jtr / (JtJ * (1.0 + lam) + 1e-12)
        ld_new = ld + step
        cost_new = cost_of(residuals(ld_new, jnp.zeros(()))[0])
        improved = cost_new < cost
        ld = jnp.where(improved, ld_new, ld)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-6), lam * 4.0)
        rel_change = jnp.abs(cost - cost_new) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_or(jnp.logical_and(improved, rel_change < 1e-6), lam > 1e4)
        cost = jnp.where(improved, cost_new, cost)
        return ld, lam, it + 1, cost, done

    def cond(state):
        return jnp.logical_and(state[2] < max_iters, jnp.logical_not(state[4]))

    ld0 = buffers.kp_logdepth[s]
    cost0 = cost_of(residuals(ld0, jnp.zeros(()))[0])
    ld, _, iters, cost, _ = jax.lax.while_loop(
        cond, body, (ld0, jnp.asarray(1e-3), jnp.asarray(0), cost0, jnp.asarray(False))
    )
    return ld, jnp.stack([cost0, cost])


def write_back(buffers: WindowBuffers, params: MapParams) -> WindowBuffers:
    """Store optimized poses/logdepths/affines back into window buffers
    (odometery.py:941-967)."""
    W = buffers.capacity
    S = buffers.supp_capacity
    return buffers.replace(
        poses=params.poses[:W],
        supp_poses=params.poses[W:].reshape(W, S, 4, 4),
        kp_logdepth=params.kp_logdepth,
        affine=params.affine[:W],
        supp_affine=params.affine[W:].reshape(W, S, 2),
    )
