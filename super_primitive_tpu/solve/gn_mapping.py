"""Gauss-Newton/LM windowed mapping with a scalar-landmark Schur complement.

The mapping problem (mapper.py) has classic bundle-adjustment structure:
per-segment scalar log-depths are "landmarks" (each residual touches exactly
one), poses/affines are "cameras".  The GN normal equations therefore split

    [ D   B ] [dl    ]   [ g_l ]
    [ B^T  H ] [dtheta] = -[ g_t ],   D diagonal over all W*N segment scalars,

and reduce by Schur to an M x M solve with M = B*(6+2) ~ 120 — trivial on
device.  Jacobians come from ONE 11-column forward-mode linearization per
(source, target) group:

  - 6 columns: right perturbation of the relative pose rel' = rel exp(d);
    the source-pose block is J_R itself and the target-pose block is
    -J_R @ Ad(rel^-1) (from rel' = exp(-xi_t) rel exp(xi_s));
  - 1 column: a uniform log-depth shift tangent — because each point's
    residual depends only on its own segment scalar, the directional
    derivative against the all-ones tangent IS the per-point partial;
  - 4 columns: source/target affine.

Forward mode shares the bilinear gather across all tangent columns (no
scatters), the same property that makes gn_track fast.

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
from ..keyframe import PointBundle
from ..lie import se3, so3
from ..ops.sampling import bilinear_sample
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


class GNMapResult(NamedTuple):
    poses: jax.Array         # (B, 4, 4)
    kp_logdepth: jax.Array   # (W, N)
    affine: jax.Array        # (B, 2)
    num_iters: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array


@functools.partial(jax.jit, static_argnames=("geo_dims", "max_iters", "use_affine"))
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
) -> GNMapResult:
    W = buffers.capacity
    S = buffers.supp_capacity
    B = W + W * S
    T_max = trg_index.shape[1]
    N = buffers.kp_logdepth.shape[1]
    M = B * 8  # 6 pose + 2 affine per entity
    C = 3      # photometric residual uses RGB channels only

    trg_images = buffers.image_pool()[trg_index]    # (W, T_max, H, Wd, C)
    affine0 = buffers.affine_pool()
    poses0 = buffers.pose_pool()
    src_samples = buffers.source_samples(geo_dims)

    # flattened group arrays (G = W * T_max)
    G = W * T_max
    g_src = jnp.repeat(jnp.arange(W), T_max)            # (G,)
    g_trg = trg_index.reshape(G)
    g_valid = (trg_valid & src_valid[:, None]).reshape(G)

    # global column index of each of the 16 local params per group
    def col_idx(s, t):
        return jnp.concatenate([
            6 * s + jnp.arange(6),
            6 * t + jnp.arange(6),
            6 * B + 2 * s + jnp.arange(2),
            6 * B + 2 * t + jnp.arange(2),
        ])

    par_mask = jnp.concatenate([
        jnp.repeat(xi_mask, 6), jnp.repeat(affine_mask, 2)
    ])  # (M,)

    ld_mask_flat = jnp.repeat(ld_mask * buffers.kf_valid.astype(ld_mask.dtype), N)

    def residual_group(gi, poses, kp_logdepth, affine, local):
        """Residuals of group gi at local tangent ``local`` (11,)."""
        s = g_src[gi]
        t = g_trg[gi]
        rel0 = jnp.matmul(
            se3.inverse(poses[t]), poses[s], precision=jax.lax.Precision.HIGHEST
        )
        rel = jnp.matmul(rel0, se3.exp(local[:6]), precision=jax.lax.Precision.HIGHEST)
        bundle = buffers.bundle_at(s)
        logd = ph.spread_logdepth(bundle, kp_logdepth[s], buffers.kp_base[s]) + local[6]
        pts = projection.unproject(bundle.uv, jnp.exp(logd), buffers.K[s])
        pts_t = projection.transform(pts, rel)
        uv_t = projection.project(pts_t, buffers.K[s])
        coords = ph.normalized_image_coords(uv_t, geo_dims)
        trg_px, trg_ok = bilinear_sample(trg_images.reshape((G,) + trg_images.shape[2:])[gi], coords)
        trg_ok = trg_ok & (jax.lax.stop_gradient(pts_t[..., 2]) > ph.Z_VALID_BATCH)
        if use_affine:
            trg_px = ph.affine_compensate(
                trg_px, affine[s] + local[7:9], affine[t] + local[9:11]
            )
        valid = (
            src_samples.valid[s] & trg_ok & bundle.valid
        ).astype(trg_px.dtype)
        # colour mode: RGB channels only (cost_utils.py:4-8)
        r = (src_samples.pixels[s][..., :3] - trg_px[..., :3]) * valid[..., None]
        return r, valid

    def group_cost(gi, poses, kp_logdepth, affine):
        r, valid = residual_group(gi, poses, kp_logdepth, affine, jnp.zeros(11))
        nv = jnp.maximum(buffers.num_valid[g_src[gi]], 1)
        return jnp.sum(jnp.abs(r)) / (C * nv)

    def total_cost(poses, kp_logdepth, affine):
        costs = jax.vmap(
            lambda gi: group_cost(gi, poses, kp_logdepth, affine)
        )(jnp.arange(G))
        per_src = (costs * g_valid).reshape(W, T_max)
        cnt = jnp.maximum(trg_valid.sum(axis=1), 1)
        return jnp.sum(per_src.sum(axis=1) / cnt * src_valid)

    def assemble(poses, kp_logdepth, affine):
        """Per-source scan with the T_max target slots vmapped — 5 wide steps
        instead of 30 narrow ones keeps the VPU fed."""
        H = jnp.zeros((M, M))
        g_t = jnp.zeros(M)
        D = jnp.zeros(W * N)
        Bm = jnp.zeros((W * N, M))
        g_l = jnp.zeros(W * N)

        def one_slot(gi, poses, kp_logdepth, affine):
            s = g_src[gi]
            t = g_trg[gi]
            rel0 = jnp.matmul(
                se3.inverse(poses[t]), poses[s],
                precision=jax.lax.Precision.HIGHEST,
            )
            r0, valid = residual_group(gi, poses, kp_logdepth, affine, jnp.zeros(11))
            Jg = jax.jacfwd(
                lambda loc: residual_group(gi, poses, kp_logdepth, affine, loc)[0]
            )(jnp.zeros(11))  # (P, C, 11)

            Ad_inv = adjoint(se3.inverse(rel0))
            J_s = Jg[..., :6]
            J_t = -jnp.einsum(
                "pci,ij->pcj", J_s, Ad_inv, precision=jax.lax.Precision.HIGHEST
            )
            L = jnp.concatenate([J_s, J_t, Jg[..., 7:11]], axis=-1)  # (P, C, 16)
            ix = col_idx(s, t)
            L = L * par_mask[ix][None, None, :]
            j_l = Jg[..., 6]                                          # (P, C)

            gv = g_valid[gi].astype(r0.dtype)
            w = gv * valid[..., None] / jnp.maximum(jnp.abs(r0), 1e-3)
            nv = jnp.maximum(buffers.num_valid[s], 1).astype(r0.dtype)
            cnt = jnp.maximum(trg_valid[s].sum(), 1).astype(r0.dtype)
            w = w / (C * nv * cnt)  # match the per-src mean normalization

            Lw = L * w[..., None]
            H_loc = jnp.einsum("pci,pcj->ij", Lw, L, precision=jax.lax.Precision.HIGHEST)
            g_loc = jnp.einsum("pci,pc->i", Lw, r0, precision=jax.lax.Precision.HIGHEST)
            d_pt = jnp.sum(w * j_l * j_l, axis=-1)          # (P,)
            b_pt = jnp.einsum("pci,pc->pi", Lw, j_l)        # (P, 16)
            gl_pt = jnp.sum(w * j_l * r0, axis=-1)          # (P,)
            return H_loc, g_loc, d_pt, b_pt, gl_pt, ix

        def per_src(carry, s):
            H, g_t, D, Bm, g_l = carry
            gis = s * T_max + jnp.arange(T_max)
            H_loc, g_loc, d_pt, b_pt, gl_pt, ix = jax.vmap(
                one_slot, in_axes=(0, None, None, None)
            )(gis, poses, kp_logdepth, affine)
            # slot-level landmark terms share the source's segment rows
            seg_rows = s * N + buffers.seg_id[s]            # (P,)
            D = D.at[seg_rows].add(jnp.sum(d_pt, axis=0))
            g_l = g_l.at[seg_rows].add(jnp.sum(gl_pt, axis=0))
            for j in range(T_max):
                Bm = Bm.at[seg_rows[:, None], ix[j][None, :]].add(b_pt[j])
                H = H.at[ix[j][:, None], ix[j][None, :]].add(H_loc[j])
                g_t = g_t.at[ix[j]].add(g_loc[j])
            return (H, g_t, D, Bm, g_l), None

        (H, g_t, D, Bm, g_l), _ = jax.lax.scan(
            per_src, (H, g_t, D, Bm, g_l), jnp.arange(W)
        )
        return H, g_t, D, Bm, g_l

    def solve_step(H, g_t, D, Bm, g_l, lam):
        # LM damping + frozen handling
        D_d = D * (1.0 + lam) + 1e-10
        D_d = jnp.where(ld_mask_flat > 0, D_d, 1.0)
        g_l_m = g_l * ld_mask_flat
        Bm_m = Bm * ld_mask_flat[:, None]

        H_d = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(M)
        H_d = H_d + jnp.diag(jnp.where(par_mask > 0, 0.0, 1.0))
        D_inv = 1.0 / D_d
        H_red = H_d - jnp.einsum(
            "li,l,lj->ij", Bm_m, D_inv, Bm_m, precision=jax.lax.Precision.HIGHEST
        )
        g_red = g_t * par_mask - Bm_m.T @ (D_inv * g_l_m)
        d_theta = -jnp.linalg.solve(H_red, g_red) * par_mask
        d_l = -(D_inv * (g_l_m + Bm_m @ d_theta)) * ld_mask_flat
        return d_theta, d_l

    kf_of = jnp.concatenate([jnp.arange(W), jnp.repeat(jnp.arange(W), S)])
    is_supp = jnp.arange(B) >= W

    def apply_update(poses, kp_logdepth, affine, d_theta, d_l):
        d_xi = d_theta[: 6 * B].reshape(B, 6)
        # opt_supporting=False: drag supporting poses with their source KF
        d_xi = jnp.where(
            (is_supp & (drag_supporting > 0))[:, None], d_xi[kf_of], d_xi
        )
        d_aff = d_theta[6 * B :].reshape(B, 2)
        poses_new = jax.vmap(se3.retract)(poses, d_xi)
        return (
            poses_new,
            kp_logdepth + d_l.reshape(W, N),
            affine + d_aff,
        )

    cost0 = total_cost(poses0, buffers.kp_logdepth, affine0)

    def body(state):
        poses, ld, aff, lam, it, cost, done = state
        H, g_t, D, Bm, g_l = assemble(poses, ld, aff)
        d_theta, d_l = solve_step(H, g_t, D, Bm, g_l, lam)
        poses_n, ld_n, aff_n = apply_update(poses, ld, aff, d_theta, d_l)
        cost_n = total_cost(poses_n, ld_n, aff_n)
        improved = cost_n < cost
        poses = jnp.where(improved, poses_n, poses)
        ld = jnp.where(improved, ld_n, ld)
        aff = jnp.where(improved, aff_n, aff)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-7), lam * 4.0)
        rel = jnp.abs(cost - cost_n) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_or(jnp.logical_and(improved, rel < tol), lam > 1e5)
        cost = jnp.where(improved, cost_n, cost)
        return poses, ld, aff, lam, it + 1, cost, done

    def cond(state):
        _, _, _, _, it, _, done = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    poses, ld, aff, _, iters, cost, _ = jax.lax.while_loop(
        cond, body,
        (poses0, buffers.kp_logdepth, affine0, jnp.asarray(1e-3),
         jnp.asarray(0), cost0, jnp.asarray(False)),
    )
    return GNMapResult(
        poses=poses, kp_logdepth=ld, affine=aff,
        num_iters=iters, initial_cost=cost0, final_cost=cost,
    )
