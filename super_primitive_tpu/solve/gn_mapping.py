"""Gauss-Newton/LM windowed mapping with a scalar-landmark Schur complement.

The mapping problem (mapper.py) has classic bundle-adjustment structure:
per-segment scalar log-depths are "landmarks" (each residual touches exactly
one), poses/affines are "cameras".  The GN normal equations therefore split

    [ D   B ] [dl    ]   [ g_l ]
    [ B^T  H ] [dtheta] = -[ g_t ],   D diagonal over all W*N segment scalars,

and reduce by Schur to an M x M solve with M = B*(6+2) ~ 120 — trivial on
device.

TPU-first linearization (this file's hot loop):

  - Jacobians are CLOSED FORM, computed in the same pass as the residual:
    the bilinear interpolant's derivative comes from the four gathered
    corners (ops/sampling.bilinear_sample_grad), chained with the analytic
    projection Jacobian du/dp, the right-perturbation pose Jacobian
    dp/d[omega,v] = [-R [X]_x | R], and dp/dlogdepth = R X = p - t.  One
    gather + a handful of (P, 3, k) einsums replaces an 11-column jacfwd
    (which pushed 11 tangent buffers through every intermediate in HBM).
  - The target-pose block reuses the source block: from
    rel' = exp(-xi_t) rel exp(xi_s), J_t = -J_s @ Ad(rel^-1).
  - Per-landmark reductions avoid scatters entirely: a per-source one-hot
    (N, P) segment matmul on the MXU accumulates D, g_l and the landmark-
    camera coupling, which stays in BLOCK form (N, 8 + 8*T_max) per source —
    the former global (W*N, M) scatter-add was the dominant cost.
  - The current-state cost falls out of the linearization pass for free;
    each LM iteration therefore costs one linearize pass plus one plain
    residual pass for the accept/reject test.

Robustness matches the reference objective via IRLS-L1 weights; damping is
classic LM with accept/reject.  Typical iteration counts: 10-30 vs the
reference's 500-1000 Adam steps (odometery.py:64-69).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cost import photometric as ph
from ..geometry import projection
from ..lie import se3, so3
from ..ops.sampling import (
    bilinear_cell_index,
    bilinear_grad_from_taps,
    bilinear_sample,
    bilinear_sample_grad,
    bilinear_sample_grad_packed,
    pack_bilinear_taps,
)
from ..odometry.window import WindowBuffers


def adjoint(T: jax.Array) -> jax.Array:
    """SE(3) adjoint for [omega, v] tangent layout:
    Ad = [[R, 0], [hat(t) R, R]]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bottom = jnp.concatenate([so3.hat(t) @ R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


_PROJ_EPS = 1e-6  # matches projection.project's z guard


def linearize_warp_factors(
    X: jax.Array,            # (P, 3) source-frame points
    src_px: jax.Array,       # (P, C>=3) source samples
    valid_static: jax.Array, # (P,) bool — src sample & bundle validity
    rel: jax.Array,          # (4, 4) T_target_from_source
    K: jax.Array,            # (3, 3)
    trg_img: jax.Array,      # (H, W, C)
    geo_dims: tuple[int, int],
    aff_s: jax.Array,        # (2,)
    aff_t: jax.Array,        # (2,)
    use_affine: bool,
    z_valid: float = ph.Z_VALID_BATCH,
    packed: bool = False,
    taps: tuple | None = None,
    taps_hw: tuple[int, int] | None = None,
):
    """Rank-2 FACTORS of the photometric-warp Jacobian (the TPU-friendly
    form consumed by :func:`assemble`).

    The 7 geometry columns of J factor exactly through the 2-dim image
    coordinate:  J7[p, c, i] = -sum_k dIs[p, c, k] * F[p, k, i]  with
    ``F = d coords / d [pose(6), logdepth(1)]`` channel-independent and
    ``dIs`` the (affine-scaled) sampled image gradient.  Building the normal
    equations from (F, dIs) instead of a materialized (P, 3, 11) J removes
    ~25 MB of HBM traffic per (source, slot) pair — the reductions were
    traffic-bound, not FLOP-bound (examples/profile_mapping_ablate.py).

    Returns (r0 (P, 3), valid (P,) float, dIs (P, 3, 2), F (P, 2, 7),
    raw3 (P, 3) the unscaled sampled pixels, ea () the affine exp factor).
    """
    Hg, Wg = geo_dims
    R = rel[:3, :3]
    t = rel[:3, 3]
    p = projection.transform(X, rel)                       # (P, 3)
    if taps is not None:
        tap_rows, t_wx, t_wy, in_bound = taps
        px_raw, dI_dc = bilinear_grad_from_taps(
            tap_rows, t_wx, t_wy, taps_hw if taps_hw is not None else geo_dims
        )
        trg_ok = in_bound
    else:
        uv = projection.project(p, K)                      # (P, 2)
        coords = ph.normalized_image_coords(uv, geo_dims)
        if packed:
            px_raw, dI_dc, trg_ok = bilinear_sample_grad_packed(trg_img, coords)
        else:
            px_raw, dI_dc, trg_ok = bilinear_sample_grad(trg_img, coords)
    trg_ok = trg_ok & (p[..., 2] > z_valid)
    valid = (valid_static & trg_ok).astype(px_raw.dtype)

    fx, fy = K[0, 0], K[1, 1]
    z = p[..., 2]
    ok_z = jnp.abs(z) > _PROJ_EPS
    z_inv = jnp.where(ok_z, 1.0 / jnp.where(ok_z, z, 1.0), _PROJ_EPS)
    dzinv = jnp.where(ok_z, -z_inv * z_inv, 0.0)
    zero = jnp.zeros_like(z)
    du_dp = jnp.stack(
        [
            jnp.stack([fx * z_inv, zero, fx * p[..., 0] * dzinv], axis=-1),
            jnp.stack([zero, fy * z_inv, fy * p[..., 1] * dzinv], axis=-1),
        ],
        axis=-2,
    )  # (P, 2, 3)

    dp_dw = -jnp.sum(
        R[None, :, :, None] * so3.hat(X)[:, None, :, :], axis=2
    )  # (P, 3, 3)
    dp_dv = jnp.broadcast_to(R, X.shape[:1] + (3, 3))
    dp_dl = (p - t)[..., None]                             # (P, 3, 1) = R X
    M7 = jnp.concatenate([dp_dw, dp_dv, dp_dl], axis=-1)   # (P, 3, 7)

    duv_d7 = jnp.sum(
        du_dp[:, :, :, None] * M7[:, None, :, :], axis=2
    )  # (P, 2, 7)
    scale = jnp.asarray([2.0 / (Wg - 1), 2.0 / (Hg - 1)], px_raw.dtype)
    F = duv_d7 * scale[None, :, None]                      # (P, 2, 7)

    raw3 = px_raw[..., :3]
    if use_affine:
        a = aff_t[0] - aff_s[0]
        ea = jnp.exp(-a)
        px = ea * raw3 + (aff_t[1] - aff_s[1])
        dIs = dI_dc[..., :3, :] * ea
    else:
        ea = jnp.ones(())
        px = raw3
        dIs = dI_dc[..., :3, :]
    r0 = (src_px[..., :3] - px) * valid[..., None]
    return r0, valid, dIs, F, raw3, ea


def linearize_warp(
    X: jax.Array,            # (P, 3) source-frame points
    src_px: jax.Array,       # (P, C>=3) source samples
    valid_static: jax.Array, # (P,) bool — src sample & bundle validity
    rel: jax.Array,          # (4, 4) T_target_from_source
    K: jax.Array,            # (3, 3)
    trg_img: jax.Array,      # (H, W, C)
    geo_dims: tuple[int, int],
    aff_s: jax.Array,        # (2,)
    aff_t: jax.Array,        # (2,)
    use_affine: bool,
    z_valid: float = ph.Z_VALID_BATCH,
    packed: bool = False,
    taps: tuple | None = None,
    taps_hw: tuple[int, int] | None = None,
):
    """Residual + closed-form Jacobian of the photometric warp.

    Returns (r0 (P, 3), valid (P,) float, J (P, 3, 11)) where the 11 local
    columns are [pose tangent (6, right-perturbation of ``rel``),
    uniform log-depth shift (1), aff_s (2), aff_t (2)] — exactly the forward
    -mode columns of the former jacfwd formulation, verified element-wise in
    tests/test_mapping.py::TestAnalyticJacobian.  Built from
    :func:`linearize_warp_factors`; :func:`assemble` consumes the factors
    directly and never materializes this J (traffic — see factors docstring).

    NOTE on the geometry chain: per-point 3x3/2x3-contraction chains are
    written as broadcast multiply-sums, NOT einsums — a dot_general with a
    tiny contraction dim batched over P lowers to MXU tiles at ~2%
    utilization, while the broadcast form is straight VPU work that XLA
    fuses into the warp.

    ``packed``: ``trg_img`` is a :func:`pack_bilinear_taps` (H, W, 4C) image;
    the warp then costs ONE row-gather per point instead of four (the gathers
    are the latency wall of the whole mapping linearization; r0/J are masked
    by ``valid`` so the packing contract holds).

    ``taps``: pre-gathered ``(tap_rows (P, 4C), wx (P,), wy (P,), in_bound
    (P,) bool)`` from :func:`bilinear_cell_index` + a pooled gather —
    ``trg_img`` is then unused.  This is how :func:`assemble` batches every
    (source, target-slot) pair's taps into ONE single-pool gather per LM
    iteration instead of per-slot gathers serialized under the source scan
    (~2x faster on TPU; the pooled indices must have been computed from the
    SAME ``X``/``rel``/``K`` this call receives).

    ``taps_hw``: the dims of the image the taps were gathered from, when
    they differ from ``geo_dims`` (coarse pyramid levels under geo_down
    semantics: coords stay normalized over the geo grid, but the tap cell
    grid and the dI/dcoords scale belong to the IMAGE — exactly what the
    non-pooled paths derive from ``trg_img.shape`` themselves).
    """
    r0, valid, dIs, F, raw3, ea = linearize_warp_factors(
        X, src_px, valid_static, rel, K, trg_img, geo_dims,
        aff_s, aff_t, use_affine, z_valid, packed, taps, taps_hw,
    )
    dpx_d7 = jnp.sum(
        dIs[:, :, :, None] * F[:, None, :, :], axis=2
    )  # (P, 3, 7)
    if use_affine:
        ones = jnp.ones_like(raw3)
        # r = s - px'; columns [a_s, b_s, a_t, b_t]
        J_aff = jnp.stack(
            [-ea * raw3, ones, ea * raw3, -ones], axis=-1
        )  # (P, 3, 4)
    else:
        J_aff = jnp.zeros(raw3.shape + (4,))
    J = jnp.concatenate([-dpx_d7, J_aff], axis=-1) * valid[..., None, None]
    return r0, valid, J


def residual_warp(
    X, src_px, valid_static, rel0, K, trg_img, geo_dims,
    aff_s, aff_t, use_affine, local,
    z_valid: float = ph.Z_VALID_BATCH,
):
    """Primal residual at an 11-dim local tangent (test oracle for the
    analytic Jacobian; jacfwd of this equals :func:`linearize_warp`'s J)."""
    rel = jnp.matmul(rel0, se3.exp(local[:6]), precision=jax.lax.Precision.HIGHEST)
    # uniform logdepth shift scales X (X = exp(logd) K^-1 u~)
    Xs = X * jnp.exp(local[6])
    p = projection.transform(Xs, rel)
    uv = projection.project(p, K)
    coords = ph.normalized_image_coords(uv, geo_dims)
    px, trg_ok = bilinear_sample(trg_img, coords)
    trg_ok = trg_ok & (jax.lax.stop_gradient(p[..., 2]) > z_valid)
    if use_affine:
        px = ph.affine_compensate(px, aff_s + local[7:9], aff_t + local[9:11])
    valid = (valid_static & trg_ok).astype(px.dtype)
    return (src_px[..., :3] - px[..., :3]) * valid[..., None], valid


class GNMapResult(NamedTuple):
    poses: jax.Array         # (B, 4, 4)
    kp_logdepth: jax.Array   # (W, N)
    affine: jax.Array        # (B, 2)
    num_iters: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array


def col16(s, t, B):
    """Unified-parameter columns of one (source, target) pair's 16 local
    columns: [src pose 6 | trg pose 6 | src affine 2 | trg affine 2]."""
    return jnp.concatenate([
        6 * s + jnp.arange(6),
        6 * t + jnp.arange(6),
        6 * B + 2 * s + jnp.arange(2),
        6 * B + 2 * t + jnp.arange(2),
    ])


def build_cmap(trg_index: jax.Array, B: int) -> jax.Array:
    """(W, Kc) per-source local-to-global column map: [src pose 6 | src
    affine 2 | slot0 trg pose 6 | slot0 trg affine 2 | slot1 ...]."""
    def cmap_of(s):
        src_cols = jnp.concatenate(
            [6 * s + jnp.arange(6), 6 * B + 2 * s + jnp.arange(2)]
        )
        trg_cols = jax.vmap(
            lambda t: jnp.concatenate(
                [6 * t + jnp.arange(6), 6 * B + 2 * t + jnp.arange(2)]
            )
        )(trg_index[s]).reshape(-1)
        return jnp.concatenate([src_cols, trg_cols])
    W = trg_index.shape[0]
    return jax.vmap(cmap_of)(jnp.arange(W))


def assemble(
    buffers, trg_index, trg_valid, src_valid, trg_images, src_samples,
    par_mask, geo_dims, use_affine, poses, kp_logdepth, affine,
    tap_dtype=None, point_stride: int = 1, factored: bool = True,
):
    """One linearization pass of the windowed mapping system: scan over
    sources, vmap over target slots; landmark reductions via one-hot segment
    matmuls (no scatters on the point axis).

    Returns (H (M, M), g_t (M,), D (W, N), gl (W, N), Bs (W, N, Kc),
    cost ()) — the camera-camera block, camera gradient, landmark diagonal,
    landmark gradient, landmark-camera coupling in per-source block form, and
    the current-state robust cost (a free byproduct of linearization).
    """
    W = buffers.capacity
    B_pool = affine.shape[0]
    T_max = trg_index.shape[1]
    N = kp_logdepth.shape[1]
    M = par_mask.shape[0]
    C = 3
    g_valid = trg_valid & src_valid[:, None]
    # one row-gather fetches all four bilinear taps (see pack_bilinear_taps);
    # images are constant over the LM solve, so XLA hoists this out of the
    # while_loop — the pack itself costs one pass over the (W, T, H, Wd, 3)
    # pool per solve.  ``tap_dtype=bf16`` halves the bytes of the random
    # row-gathers (the latency wall of the linearization); image values come
    # from uint8/255, so bf16's 8 mantissa bits match the source precision.
    # r0/J are cast back to f32 right after sampling — only the tap VALUES
    # are quantized, every reduction stays f32.
    if tap_dtype is not None:
        trg_images = trg_images.astype(tap_dtype)
    trg_packed = jax.vmap(jax.vmap(pack_bilinear_taps))(trg_images)

    Hp, Wp, C4 = trg_packed.shape[-3:]

    def per_src(carry, s):
        H_acc, g_acc, cost_acc = carry
        bundle = buffers.bundle_at(s)
        logd = ph.spread_logdepth(bundle, kp_logdepth[s], buffers.kp_base[s])
        X = projection.unproject(bundle.uv, jnp.exp(logd), buffers.K[s])
        src_px = src_samples.pixels[s]
        vstat = src_samples.valid[s] & bundle.valid
        seg_id = bundle.seg_id
        if point_stride > 1:
            # flagged speed/accuracy knob: linearize on every k-th bundle
            # point.  The random row-gathers are the latency wall of the
            # whole solve (NOTES_NEXT); stride k cuts gather rows (and the
            # one-hot reduction width) by k while each ~256-point segment
            # keeps >=64 constraints.  Objective = the same masked mean over
            # the retained points; default 1 = exact reference objective.
            X = X[::point_stride]
            src_px = src_px[::point_stride]
            vstat = vstat[::point_stride]
            seg_id = seg_id[::point_stride]
            nv = jnp.maximum(
                jnp.sum(bundle.valid[::point_stride]), 1
            ).astype(jnp.float32)
        else:
            nv = jnp.maximum(bundle.num_valid, 1).astype(jnp.float32)
        cnt = jnp.maximum(trg_valid[s].sum(), 1).astype(jnp.float32)

        # per-source pooled tap fetch: the T_max slot images are flattened
        # into ONE (T*H*W, 4C) pool and all slots' taps come from a single
        # gather — ~14% faster than per-slot gathers batched over the slot
        # axis (chip A/B).  NEGATIVE RESULT (round-3 chip A/B): pooling
        # across ALL (source, slot) pairs into a W*T*H*W-row pool goes
        # superlinearly SLOWER (53 ms vs 14 ms for the same 2.3M rows) —
        # past ~64 MB the gather operand stops staging on-chip and every
        # row pays HBM latency.  Keep pools per-source (~22 MB at TUM
        # mapping scale).
        def slot_cells(slot, t):
            rel0 = jnp.matmul(
                se3.inverse(poses[t]), poses[s],
                precision=jax.lax.Precision.HIGHEST,
            )
            p = projection.transform(X, rel0)
            uv = projection.project(p, buffers.K[s])
            coords = ph.normalized_image_coords(uv, geo_dims)
            # cell grid = the IMAGE dims (Hp, Wp), not geo_dims: under
            # geo_down semantics coarse-level images are smaller than the
            # geo grid, and a geo-grid index into the image-shaped pool
            # lands out of bounds (jnp.take fills OOB rows with NaN)
            idx, wx, wy, okb = bilinear_cell_index(coords, (Hp, Wp))
            return idx + slot * (Hp * Wp), wx, wy, okb

        idx_s, wx_s, wy_s, okb_s = jax.vmap(slot_cells)(
            jnp.arange(T_max), trg_index[s]
        )                                                   # (T, P)
        P = idx_s.shape[-1]
        pool_s = trg_packed[s].reshape(T_max * Hp * Wp, C4)
        taps_s = jnp.take(pool_s, idx_s.reshape(-1), axis=0).reshape(
            T_max, P, C4
        )

        def one_slot_factored(t, gv, tap_rows, t_wx, t_wy, t_okb, aff_t):
            """Factored normal-equation blocks: the 7 geometry columns of J
            factor through the 2-dim image coordinate (J7 = -dIs @ F), so
            every reduction is built from (P, 2, 7)/(P, 3, 2) factors — the
            (P, 3, 10) J/Jw/Jsub of the direct path (below) never exist.
            Same math, element-wise equal to 1e-5 (TestFactoredAssemble)."""
            rel0 = jnp.matmul(
                se3.inverse(poses[t]), poses[s],
                precision=jax.lax.Precision.HIGHEST,
            )
            r0, valid, dIs, F, raw3, ea = linearize_warp_factors(
                X,
                src_px.astype(taps_s.dtype) if tap_dtype is not None else src_px,
                vstat, rel0, buffers.K[s], None, geo_dims,
                affine[s], aff_t, use_affine,
                taps=(tap_rows, t_wx, t_wy, t_okb),
                taps_hw=(Hp, Wp),
            )
            r0 = r0.astype(jnp.float32)
            dIs = dIs.astype(jnp.float32)
            F = F.astype(jnp.float32)
            raw3 = raw3.astype(jnp.float32)
            ea = ea.astype(jnp.float32)
            valid = valid.astype(jnp.float32)
            ix = col16(s, t, B_pool)

            gvf = gv.astype(r0.dtype)
            w = gvf * valid[..., None] / jnp.maximum(jnp.abs(r0), 1e-3)
            w = w / (C * nv * cnt)                           # (P, 3)

            wdI = w[..., None] * dIs                         # (P, 3, 2)
            # channel contractions (c = 3): pure VPU broadcast-sums
            G = jnp.sum(wdI[:, :, :, None] * dIs[:, :, None, :], axis=1)  # (P,2,2)
            rI = jnp.sum(wdI * r0[..., None], axis=1)        # (P, 2)
            if use_affine:
                era = ea * raw3                              # (P, 3)
                Ar = jnp.sum(wdI * era[..., None], axis=1)   # (P, 2)
                A1 = jnp.sum(wdI, axis=1)                    # (P, 2)
                s2 = jnp.sum(w * era * era, axis=1)          # (P,)
                s1 = jnp.sum(w * era, axis=1)
                s0 = jnp.sum(w, axis=1)
                u1 = jnp.sum(w * era * r0, axis=1)
                v0 = jnp.sum(w * r0, axis=1)
            else:
                # J_aff is identically zero (linearize_warp contract)
                P = r0.shape[0]
                Ar = A1 = jnp.zeros((P, 2))
                s2 = s1 = s0 = u1 = v0 = jnp.zeros((P,))

            tmp = jnp.sum(G[:, :, :, None] * F[:, None, :, :], axis=2)  # (P,2,7)
            H77 = jnp.einsum(
                "pki,pkj->ij", F, tmp, precision=jax.lax.Precision.HIGHEST
            )
            g7 = -jnp.einsum(
                "pk,pki->i", rI, F, precision=jax.lax.Precision.HIGHEST
            )
            # J_aff columns are [-ea raw, 1, ea raw, -1] -> A-stack (P, 2, 4)
            Astack = jnp.stack([-Ar, A1, Ar, -A1], axis=-1)
            H7a = -jnp.einsum(
                "pki,pkm->im", F, Astack, precision=jax.lax.Precision.HIGHEST
            )
            S2, S1, S0 = jnp.sum(s2), jnp.sum(s1), jnp.sum(s0)
            # Haa[m, n] = sum w Jaff[m] Jaff[n], Jaff = [-er, 1, er, -1]
            Haa = jnp.stack([
                jnp.stack([S2, -S1, -S2, S1]),
                jnp.stack([-S1, S0, S1, -S0]),
                jnp.stack([-S2, S1, S2, -S1]),
                jnp.stack([S1, -S0, -S1, S0]),
            ])
            U1, V0 = jnp.sum(u1), jnp.sum(v0)
            g_aff = jnp.stack([-U1, V0, U1, -V0])

            H10 = jnp.zeros((10, 10))
            H10 = H10.at[:6, :6].set(H77[:6, :6])
            H10 = H10.at[:6, 6:].set(H7a[:6])
            H10 = H10.at[6:, :6].set(H7a[:6].T)
            H10 = H10.at[6:, 6:].set(Haa)
            g10 = jnp.concatenate([g7[:6], g_aff])

            # per-point landmark payload
            tmp6 = tmp[:, :, 6]                               # (P, 2)
            b7_pt = jnp.sum(F * tmp6[:, :, None], axis=1)     # (P, 7)
            d_pt = b7_pt[:, 6]
            gl_pt = -jnp.sum(F[:, :, 6] * rI, axis=1)
            baff_pt = -jnp.sum(Astack * F[:, :, 6][:, :, None], axis=1)  # (P, 4)
            b_pt = jnp.concatenate([b7_pt[:, :6], baff_pt], axis=-1)  # (P, 10)

            Ad_inv = adjoint(se3.inverse(rel0))
            Tmat = jnp.zeros((10, 16))
            Tmat = Tmat.at[:6, :6].set(jnp.eye(6))
            Tmat = Tmat.at[:6, 6:12].set(-Ad_inv)
            Tmat = Tmat.at[6:, 12:].set(jnp.eye(4))
            m = par_mask[ix]
            H_loc = (Tmat.T @ H10 @ Tmat) * m[:, None] * m[None, :]
            g_loc = (Tmat.T @ g10) * m
            cost_slot = gvf * jnp.sum(jnp.abs(r0)) / (C * nv)
            return H_loc, g_loc, d_pt, b_pt, gl_pt, ix, Tmat, cost_slot

        def one_slot(t, gv, tap_rows, t_wx, t_wy, t_okb, aff_t):
            rel0 = jnp.matmul(
                se3.inverse(poses[t]), poses[s],
                precision=jax.lax.Precision.HIGHEST,
            )
            r0, valid, J = linearize_warp(
                X,
                src_px.astype(taps_s.dtype) if tap_dtype is not None else src_px,
                vstat, rel0, buffers.K[s], None, geo_dims,
                affine[s], aff_t, use_affine,
                taps=(tap_rows, t_wx, t_wy, t_okb),
                taps_hw=(Hp, Wp),
            )
            r0 = r0.astype(jnp.float32)
            J = J.astype(jnp.float32)
            valid = valid.astype(jnp.float32)
            ix = col16(s, t, B_pool)
            j_l = J[..., 6]

            # 10-column local basis [src pose 6 | affines 4]; the 16-column
            # system (with the target-pose block J_t = -J_s Ad) is exactly
            # T^T (.) T for T10->16 = [[I6, -Ad, 0], [0, 0, I4]], so the
            # per-point reductions run at 10 columns and the expansion +
            # par_mask happen on the tiny reduced objects afterwards —
            # avoids materializing the (P, 3, 16) masked L/Lw entirely.
            Ad_inv = adjoint(se3.inverse(rel0))
            Tmat = jnp.zeros((10, 16))
            Tmat = Tmat.at[:6, :6].set(jnp.eye(6))
            Tmat = Tmat.at[:6, 6:12].set(-Ad_inv)
            Tmat = Tmat.at[6:, 12:].set(jnp.eye(4))
            Jsub = jnp.concatenate([J[..., :6], J[..., 7:11]], axis=-1)

            gvf = gv.astype(r0.dtype)
            w = gvf * valid[..., None] / jnp.maximum(jnp.abs(r0), 1e-3)
            w = w / (C * nv * cnt)  # per-src mean normalization
            Jw = Jsub * w[..., None]
            H10 = jnp.einsum(
                "pci,pcj->ij", Jw, Jsub, precision=jax.lax.Precision.HIGHEST
            )
            g10 = jnp.einsum(
                "pci,pc->i", Jw, r0, precision=jax.lax.Precision.HIGHEST
            )
            m = par_mask[ix]
            H_loc = (Tmat.T @ H10 @ Tmat) * m[:, None] * m[None, :]
            g_loc = (Tmat.T @ g10) * m
            d_pt = jnp.sum(w * j_l * j_l, axis=-1)          # (P,)
            b_pt = jnp.sum(Jw * j_l[..., None], axis=1)     # (P, 10)
            gl_pt = jnp.sum(w * j_l * r0, axis=-1)          # (P,)
            cost_slot = gvf * jnp.sum(jnp.abs(r0)) / (C * nv)
            return H_loc, g_loc, d_pt, b_pt, gl_pt, ix, Tmat, cost_slot

        slot_fn = one_slot_factored if factored else one_slot
        H_loc, g_loc, d_pt, b_pt, gl_pt, ix, Tmats, cost_slot = jax.vmap(slot_fn)(
            trg_index[s], g_valid[s], taps_s, wx_s, wy_s,
            okb_s, affine[trg_index[s]]
        )

        # landmark reduction: one-hot segment matmul on the MXU
        onehot = (
            jnp.arange(N)[:, None] == seg_id[None, :]
        ).astype(jnp.float32)                               # (N, P)
        payload = jnp.concatenate(
            [d_pt[..., None], gl_pt[..., None], b_pt], axis=-1
        )                                                    # (T, P, 12)
        seg = jnp.einsum(
            "np,tpk->tnk", onehot, payload,
            precision=jax.lax.Precision.HIGHEST,
        )                                                    # (T, N, 12)
        D_s = jnp.sum(seg[..., 0], axis=0)                   # (N,)
        gl_s = jnp.sum(seg[..., 1], axis=0)                  # (N,)
        # expand the reduced landmark-camera coupling to 16 columns + mask
        bseg = jnp.einsum(
            "tnk,tkj->tnj", seg[..., 2:], Tmats,
            precision=jax.lax.Precision.HIGHEST,
        ) * jax.vmap(lambda i: par_mask[i])(ix)[:, None, :]  # (T, N, 16)
        b_src = jnp.sum(
            jnp.concatenate([bseg[..., 0:6], bseg[..., 12:14]], axis=-1),
            axis=0,
        )                                                    # (N, 8)
        b_trg = jnp.concatenate(
            [bseg[..., 6:12], bseg[..., 14:16]], axis=-1
        )                                                    # (T, N, 8)
        Bs = jnp.concatenate(
            [b_src, jnp.moveaxis(b_trg, 0, 1).reshape(N, T_max * 8)],
            axis=-1,
        )                                                    # (N, Kc)

        # camera-camera block + gradient (tiny scatters: 16x16 per slot)
        def add_slot(acc, j):
            H_a, g_a = acc
            H_a = H_a.at[ix[j][:, None], ix[j][None, :]].add(H_loc[j])
            g_a = g_a.at[ix[j]].add(g_loc[j])
            return (H_a, g_a), None

        (H_acc, g_acc), _ = jax.lax.scan(
            add_slot, (H_acc, g_acc), jnp.arange(T_max)
        )
        cost_acc = cost_acc + jnp.sum(cost_slot) / cnt * src_valid[s].astype(
            cost_slot.dtype
        )
        return (H_acc, g_acc, cost_acc), (D_s, gl_s, Bs)

    (H, g_t, cost_cur), (D, gl, Bs) = jax.lax.scan(
        per_src,
        (jnp.zeros((M, M)), jnp.zeros(M), jnp.zeros(())),
        jnp.arange(W),
    )
    return H, g_t, D, gl, Bs, cost_cur


def solve_step(H, g_t, D, gl, Bs, lam, ld_w, par_mask, cmap):
    """LM-damped Schur-reduced solve of the assembled normal equations.

    Returns (d_theta (M,), d_l (W, N))."""
    M = par_mask.shape[0]
    D_d = jnp.where(ld_w > 0, D * (1.0 + lam) + 1e-10, 1.0)     # (W, N)
    D_inv = 1.0 / D_d
    gl_m = gl * ld_w
    Bs_m = Bs * ld_w[..., None]                                 # (W, N, Kc)

    H_d = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(M)
    H_d = H_d + jnp.diag(jnp.where(par_mask > 0, 0.0, 1.0))

    corr = jnp.einsum(
        "wnk,wn,wnl->wkl", Bs_m, D_inv, Bs_m,
        precision=jax.lax.Precision.HIGHEST,
    )                                                           # (W, Kc, Kc)
    H_red = H_d - jnp.zeros((M, M)).at[
        cmap[:, :, None], cmap[:, None, :]
    ].add(corr)
    gc = jnp.einsum("wnk,wn->wk", Bs_m, D_inv * gl_m)
    g_red = g_t * par_mask - jnp.zeros(M).at[cmap].add(gc)
    d_theta = -jnp.linalg.solve(H_red, g_red) * par_mask
    d_l = -(
        D_inv * (gl_m + jnp.einsum("wnk,wk->wn", Bs_m, d_theta[cmap]))
    ) * ld_w
    return d_theta, d_l


@functools.partial(
    jax.jit,
    static_argnames=(
        "geo_dims", "max_iters", "use_affine", "tap_dtype", "point_stride",
        "factored", "point_trim", "pin_scale_gauge",
    ),
)
def gn_mapping(
    buffers: WindowBuffers,
    trg_index: jax.Array,     # (W, T_max)
    trg_valid: jax.Array,     # (W, T_max)
    src_valid: jax.Array,     # (W,)
    xi_mask: jax.Array,       # (B,)
    ld_mask: jax.Array,       # (W,)
    affine_mask: jax.Array,   # (B,)
    geo_dims: tuple[int, int],
    max_iters: int = 30,
    use_affine: bool = False,
    tol: float = 1e-5,
    drag_supporting: jax.Array = np.float32(0.0),
    tap_dtype: str | None = None,  # see NEGATIVE RESULT below — keep None
    point_stride: int = 1,         # >1: linearize on every k-th bundle point
    factored: bool = True,         # factored normal equations (same math)
    point_trim: int | None = None,  # static point-axis slice (see
                                    # WindowBuffers.bundle_at: exact for any
                                    # trim >= every slot's num_valid)
    pin_scale_gauge: bool = False,  # mono-init gauge retraction, see below
) -> GNMapResult:
    # NEGATIVE RESULT (round-3 chip A/B, examples/bench_mapping.py):
    # tap_dtype="bfloat16" is 70% SLOWER (48.1 vs 28.4 ms/LM-iter) — TPU
    # row-gathers operate on 32-bit lanes, so half-width elements force a
    # slower sub-word gather path; halving the gathered bytes does not help
    # a latency-bound gather.  It also costs accuracy (pose error 1.15-1.7x
    # at the low-error floor).  The flag stays so nobody re-tries blindly.
    if point_trim is not None:
        # bundles are front-compacted and every reduction masks on validity
        # and normalizes by num_valid, so slicing the padded tail off the
        # point axis is exact (the capacity carries 2x headroom)
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
    N = buffers.kp_logdepth.shape[1]
    M = B * 8      # 6 pose + 2 affine per entity
    Kc = 8 + 8 * T_max  # per-source local columns: src params + per-slot trg
    C = 3

    trg_images = buffers.image_pool()[trg_index]    # (W, T_max, H, Wd, C)
    affine0 = buffers.affine_pool()
    poses0 = buffers.pose_pool()
    src_samples = buffers.source_samples(geo_dims)

    par_mask = jnp.concatenate([
        jnp.repeat(xi_mask, 6), jnp.repeat(affine_mask, 2)
    ])  # (M,)
    ld_w = (ld_mask * buffers.kf_valid.astype(ld_mask.dtype))[:, None] * jnp.ones(
        (1, N)
    )  # (W, N)
    cmap = build_cmap(trg_index, B)                 # (W, Kc)

    def assemble_at(poses, kp_logdepth, affine):
        return assemble(
            buffers, trg_index, trg_valid, src_valid, trg_images, src_samples,
            par_mask, geo_dims, use_affine, poses, kp_logdepth, affine,
            tap_dtype=jnp.dtype(tap_dtype) if tap_dtype else None,
            point_stride=point_stride, factored=factored,
        )

    def solve_at(H, g_t, D, gl, Bs, lam):
        return solve_step(H, g_t, D, gl, Bs, lam, ld_w, par_mask, cmap)

    kf_of = jnp.concatenate([jnp.arange(W), jnp.repeat(jnp.arange(W), S)])
    is_supp = jnp.arange(B) >= W

    def apply_update(poses, kp_logdepth, affine, d_theta, d_l, D):
        d_xi = d_theta[: 6 * B].reshape(B, 6)
        # opt_supporting=False: drag supporting poses with their source KF
        d_xi = jnp.where(
            (is_supp & (drag_supporting > 0))[:, None], d_xi[kf_of], d_xi
        )
        d_aff = d_theta[6 * B :].reshape(B, 2)
        c = jnp.float32(0.0)
        if pin_scale_gauge:
            # Mono-scale gauge retraction (PARITY.md fragility note): the
            # 2-KF mono-init problem has an exact photometric null direction
            #   kp_logdepth += c (all active landmarks),  t_WC *= e^c (all
            # poses) — depths and camera centers co-scale, projections are
            # invariant.  LM can wander along it on f32 reduction noise,
            # flipping the damping trajectory (observed once on chip: ATE
            # 0.005 vs 0.17 from a ~1e-8 perturbation).  Retract each
            # accepted step back to mean(ld) = const: subtract the step's
            # mean logdepth shift over landmarks that received taps and
            # rescale every translation by e^{-c}.  Exactly cost-neutral;
            # valid only when every gauge-frozen pose has zero translation
            # (mono init starts the first keyframe at identity).
            w = ld_w * (D > 1e-12)
            c = jnp.sum(d_l * w) / jnp.maximum(jnp.sum(w), 1.0)
            d_l = d_l - c * w
        poses_new = jax.vmap(se3.retract)(poses, d_xi)
        if pin_scale_gauge:
            poses_new = poses_new.at[:, :3, 3].multiply(jnp.exp(-c))
        return poses_new, kp_logdepth + d_l, affine + d_aff

    # LM with linearize-at-trial-point: ``assemble`` computes the state's
    # cost as a byproduct of linearization, so each iteration costs ONE
    # assemble pass (the former separate eval_cost pass per accept/reject
    # test doubled the per-iteration work).  On reject, the retained
    # linearization of the best state is re-solved at the raised damping.
    lin0 = assemble_at(poses0, buffers.kp_logdepth, affine0)
    cost0 = lin0[5]

    def body(state):
        poses, ld, aff, lin, lam, it, cost, done = state
        H, g_t, D, gl, Bs, _ = lin
        d_theta, d_l = solve_at(H, g_t, D, gl, Bs, lam)
        poses_n, ld_n, aff_n = apply_update(poses, ld, aff, d_theta, d_l, D)
        lin_n = assemble_at(poses_n, ld_n, aff_n)
        cost_n = lin_n[5]
        improved = cost_n < cost
        poses = jnp.where(improved, poses_n, poses)
        ld = jnp.where(improved, ld_n, ld)
        aff = jnp.where(improved, aff_n, aff)
        lin = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old), lin_n, lin
        )
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-7), lam * 4.0)
        rel = jnp.abs(cost - cost_n) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_or(jnp.logical_and(improved, rel < tol), lam > 1e5)
        cost = jnp.where(improved, cost_n, cost)
        return poses, ld, aff, lin, lam, it + 1, cost, done

    def cond(state):
        _, _, _, _, _, it, _, done = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    poses, ld, aff, _, _, iters, cost, _ = jax.lax.while_loop(
        cond, body,
        (poses0, buffers.kp_logdepth, affine0, lin0, jnp.asarray(1e-3),
         jnp.asarray(0), cost0, jnp.asarray(False)),
    )
    return GNMapResult(
        poses=poses, kp_logdepth=ld, affine=aff,
        num_iters=iters, initial_cost=cost0, final_cost=cost,
    )
