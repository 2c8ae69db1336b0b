"""Batched bilateral normal integration (BiNI) — matrix-free, on-device.

Replaces the reference's CuPy submodule ``batched_normal_integration``
(reference: frontend/normals/normals_integration.py:5,19-23; .gitmodules:1-3 —
the submodule is not vendored), which solves, per SAM segment, a
screened-Poisson-style sparse system by conjugate gradient and returns
per-segment depth up to scale.  Method: Bilateral Normal Integration
(Cao et al., ECCV 2022), perspective case.

Math.  With pixel offsets u~ = col - cx, v~ = row - cy and log-depth
zt = log z, the surface-tangency constraints n . dS/du = n . dS/dv = 0 give

    D zt_u + nx / fx = 0,      D zt_v + ny / fy = 0,
    D = nx u~ / fx + ny v~ / fy + nz.

Each equation is discretized with BOTH one-sided differences; a sigmoid
bilateral weight softly selects the side with the smaller residual
(discontinuity handling).  The weighted least squares normal equations

    A zt = b,   A = sum_d G_d^T diag(q_d) G_d,   q_d = w_d m_d D^2,
    b = -sum_d G_d^T (w_d m_d D c_d),

are solved matrix-free: every operator application is 4 masked shift-
difference stencils — pure VPU work, vmapped over the segment batch via
broadcasting.  Outer fixed-point iterations update the bilateral weights
(IRLS); inner Jacobi-preconditioned CG runs as a ``lax.while_loop`` until
every segment's relative residual passes ``cg_tol`` or ``cg_max_iter`` is
reached (reference config surface: cg_max_iter 1000-2000, cg_tol 1e-3/1e-4,
config/replica_sfm_example.yaml:28-29).

The per-segment constant offset of zt is the gauge freedom that becomes the
SuperPrimitive scalar DoF; we fix it to mean(zt) = 0 inside each mask.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BiniConfig:
    k: float = 2.0              # bilateral sigmoid sharpness (BiNI default)
    outer_iters: int = 5        # IRLS weight updates
    cg_max_iter: int = 1000     # reference config surface
    cg_tol: float = 1e-3


def _shift(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """Shift an (..., H, W) field by (dr, dc), zero-filling."""
    return jnp.roll(x, (dr, dc), axis=(-2, -1))


def _edge_masks(mask: jax.Array):
    """Validity of the 4 one-sided differences: both endpoints in mask.

    Border columns/rows are explicitly invalidated on the wrapped side —
    ``jnp.roll`` wraps, and a mask touching both image borders must not pair
    opposite-edge pixels.
    """
    m = mask
    H, W = m.shape[-2], m.shape[-1]
    col = jnp.arange(W)
    row = jnp.arange(H)[:, None]
    not_last_col = col < W - 1
    not_first_col = col > 0
    not_last_row = row < H - 1
    not_first_row = row > 0
    return {
        "up": m & _shift(m, 0, -1) & not_last_col,   # (r, c) & (r, c+1)
        "um": m & _shift(m, 0, 1) & not_first_col,   # (r, c) & (r, c-1)
        "vp": m & _shift(m, -1, 0) & not_last_row,   # (r, c) & (r+1, c)
        "vm": m & _shift(m, 1, 0) & not_first_row,   # (r, c) & (r-1, c)
    }


def _diff(zt: jax.Array, d: str) -> jax.Array:
    """One-sided difference of an (..., H, W) field (zero-filled borders).

    Forward: zt(p + e) - zt(p); backward: zt(p) - zt(p - e).  Backward at p
    equals forward at p - e; we keep all four for per-side weighting.
    """
    if d == "up":
        return _shift(zt, 0, -1) - zt
    if d == "um":
        return zt - _shift(zt, 0, 1)
    if d == "vp":
        return _shift(zt, -1, 0) - zt
    if d == "vm":
        return zt - _shift(zt, 1, 0)
    raise ValueError(d)


def _diff_adjoint(y: jax.Array, d: str) -> jax.Array:
    """Adjoint of :func:`_diff` (w.r.t. the standard inner product)."""
    if d == "up":
        return _shift(y, 0, 1) - y
    if d == "um":
        return y - _shift(y, 0, -1)
    if d == "vp":
        return _shift(y, 1, 0) - y
    if d == "vm":
        return y - _shift(y, -1, 0)
    raise ValueError(d)


def _coefficients(normals: jax.Array, K: jax.Array):
    """Per-pixel D, c_u = nx/fx, c_v = ny/fy for (H, W, 3) normals."""
    H, W, _ = normals.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    col = jnp.arange(W, dtype=normals.dtype)[None, :] - cx
    row = jnp.arange(H, dtype=normals.dtype)[:, None] - cy
    D = nx * col / fx + ny * row / fy + nz
    return D, nx / fx, ny / fy


def _weights_from_residuals(zt, D, c_u, c_v, em, k):
    """Bilateral sigmoid weights for the forward sides (paper eq. 5):
    w = sigmoid(k * (r_minus^2 - r_plus^2)); sides with an invalid edge get
    zero effective weight via the edge masks (handled by callers)."""
    r_up = D * _diff(zt, "up") + c_u
    r_um = D * _diff(zt, "um") + c_u
    r_vp = D * _diff(zt, "vp") + c_v
    r_vm = D * _diff(zt, "vm") + c_v
    w_u = jax.nn.sigmoid(k * (r_um**2 * em["um"] - r_up**2 * em["up"]))
    w_v = jax.nn.sigmoid(k * (r_vm**2 * em["vm"] - r_vp**2 * em["vp"]))
    return w_u, w_v


def _system(D, c_u, c_v, em, w_u, w_v):
    """Per-edge quadratic weights q_d, rhs b and Jacobi diagonal."""
    q = {
        "up": w_u * em["up"] * D * D,
        "um": (1.0 - w_u) * em["um"] * D * D,
        "vp": w_v * em["vp"] * D * D,
        "vm": (1.0 - w_v) * em["vm"] * D * D,
    }
    c = {"up": c_u, "um": c_u, "vp": c_v, "vm": c_v}
    wm = {
        "up": w_u * em["up"],
        "um": (1.0 - w_u) * em["um"],
        "vp": w_v * em["vp"],
        "vm": (1.0 - w_v) * em["vm"],
    }
    b = 0.0
    for d in ("up", "um", "vp", "vm"):
        b = b - _diff_adjoint(wm[d] * D * c[d], d)

    # diag(A): q_d at p plus the neighbor's q_d shifted back onto p
    diag = (
        q["up"] + _shift(q["up"], 0, 1)
        + q["um"] + _shift(q["um"], 0, -1)
        + q["vp"] + _shift(q["vp"], 1, 0)
        + q["vm"] + _shift(q["vm"], -1, 0)
    )
    return q, b, diag


def _apply_A(zt, D, q):
    out = 0.0
    for d in ("up", "um", "vp", "vm"):
        out = out + _diff_adjoint(q[d] * _diff(zt, d), d)
    return out


def _masked_dot(a, b, mask):
    return jnp.sum(a * b * mask, axis=(-2, -1))


def _pcg(apply_A, b, x0, mask, diag, max_iter, tol):
    """Batched Jacobi-PCG on (N, H, W) fields.

    ``apply_A(p) -> (Ap, pAp)`` — the fused form lets the Pallas stencil
    kernel emit the dot product in the same VMEM pass.

    Per-segment early freeze; global stop when every segment converged,
    stagnated, or ``max_iter`` elapsed.  Robustness: fp32 CG run past its
    achievable precision slowly *diverges*, so we (a) floor the relative
    tolerance at 5e-7, (b) track the best-residual iterate per segment and
    return that, (c) freeze segments whose residual grows 10x above best.
    """
    inv_diag = jnp.where(diag > 1e-12, 1.0 / jnp.where(diag > 1e-12, diag, 1.0), 0.0)
    maskf = mask.astype(b.dtype)

    def precond(r):
        return r * inv_diag * maskf

    x = x0 * maskf
    r = (b - apply_A(x)[0]) * maskf
    z = precond(r)
    p = z
    rz = _masked_dot(r, z, maskf)
    b_norm = jnp.sqrt(_masked_dot(b, b, maskf))
    thresh = jnp.maximum(tol, 5e-7) * jnp.maximum(b_norm, 1e-30)
    r_norm0 = jnp.sqrt(_masked_dot(r, r, maskf))

    def seg_active(r_norm, best):
        converged = r_norm <= thresh
        diverging = r_norm > 10.0 * best + 1e-30
        return jnp.logical_not(converged | diverging)

    def cond(state):
        x, r, z, p, rz, x_best, best, it = state
        r_norm = jnp.sqrt(_masked_dot(r, r, maskf))
        return jnp.logical_and(it < max_iter, jnp.any(seg_active(r_norm, best)))

    def body(state):
        x, r, z, p, rz, x_best, best, it = state
        r_norm = jnp.sqrt(_masked_dot(r, r, maskf))
        improved = (r_norm < best)[:, None, None]
        x_best = jnp.where(improved, x, x_best)
        best = jnp.minimum(best, r_norm)

        active = seg_active(r_norm, best).astype(b.dtype)[:, None, None]
        Ap, pAp = apply_A(p)
        alpha = jnp.where(pAp > 1e-30, rz / jnp.where(pAp > 1e-30, pAp, 1.0), 0.0)
        alpha = alpha[:, None, None] * active
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = _masked_dot(r, z, maskf)
        beta = jnp.where(rz > 1e-30, rz_new / jnp.where(rz > 1e-30, rz, 1.0), 0.0)
        p = z + beta[:, None, None] * p * active
        return (x, r, z, p, rz_new, x_best, best, it + 1)

    init = (x, r, z, p, rz, x, r_norm0, jnp.asarray(0))
    x, r, _, _, _, x_best, best, iters = jax.lax.while_loop(cond, body, init)
    # final candidate may beat the recorded best
    r_norm = jnp.sqrt(_masked_dot(r, r, maskf))
    x_best = jnp.where((r_norm < best)[:, None, None], x, x_best)
    return x_best, iters


def _solve_given_coeffs(D, c_u, c_v, masks, config: BiniConfig):
    """IRLS + PCG given per-pixel coefficients.

    ``D``, ``c_u``, ``c_v`` broadcast against (N, h, w) masks — shared (h, w)
    fields for the full-frame path, per-segment (N, h, w) for crops.
    """
    maskf = masks.astype(jnp.float32)
    em_b = _edge_masks(masks)
    em = {k_: v.astype(jnp.float32) for k_, v in em_b.items()}

    zt = jnp.zeros_like(maskf)
    w_u = jnp.full_like(maskf, 0.5)
    w_v = jnp.full_like(maskf, 0.5)

    import jax as _jax

    from ..ops.pallas_stencil import bini_apply, bini_cg_pallas

    # in-kernel CG needs all fields of one segment resident in VMEM
    h, w = maskf.shape[-2], maskf.shape[-1]
    in_kernel = _jax.default_backend() == "tpu" and (h * w * 4 * 10) < 8 * 2**20

    for _ in range(config.outer_iters):
        q, b, diag = _system(D, c_u, c_v, em, w_u, w_v)
        q_up, q_um, q_vp, q_vm = (
            jnp.broadcast_to(q[k], maskf.shape) for k in ("up", "um", "vp", "vm")
        )
        if in_kernel:
            diag_b = jnp.broadcast_to(diag, maskf.shape)
            zt = bini_cg_pallas(
                b * maskf, zt, maskf, diag_b, q_up, q_um, q_vp, q_vm,
                int(config.cg_max_iter), float(config.cg_tol),
            )
        else:
            apply_A = lambda x: bini_apply(x, q_up, q_um, q_vp, q_vm)  # noqa: E731
            zt, _ = _pcg(
                apply_A, b * maskf, zt, masks, diag, config.cg_max_iter, config.cg_tol
            )
        # gauge fix before the weight update for numerical stability
        npix = jnp.maximum(jnp.sum(maskf, axis=(-2, -1)), 1.0)
        mean = jnp.sum(zt * maskf, axis=(-2, -1)) / npix
        zt = (zt - mean[:, None, None]) * maskf
        w_u, w_v = _weights_from_residuals(zt, D, c_u, c_v, em, config.k)

    return zt * maskf


@functools.partial(jax.jit, static_argnames=("config",))
def integrate_normals(
    normals: jax.Array,
    masks: jax.Array,
    K: jax.Array,
    config: BiniConfig = BiniConfig(),
) -> jax.Array:
    """Integrate (H, W, 3) normals inside each of N segment masks.

    Returns per-segment log-depth fields (N, H, W), zero outside the mask and
    gauge-fixed to mean 0 inside (depth is ``exp`` of this, up to the
    per-segment scalar the tracker optimizes).

    Equivalent of ``normal_integration_batch_cupy`` + the log conversion the
    frontend performs afterwards (process_frame.py:231-236).
    """
    masks = masks.astype(bool)
    D, c_u, c_v = _coefficients(normals, K)
    return _solve_given_coeffs(D, c_u, c_v, masks, config)


def _coefficients_window(normals_crop, K, r0, c0):
    """Per-pixel D, c_u, c_v for a crop whose top-left sits at global pixel
    (r0, c0) — the pixel-offset generalization of :func:`_coefficients`."""
    h, w, _ = normals_crop.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    nx, ny, nz = normals_crop[..., 0], normals_crop[..., 1], normals_crop[..., 2]
    col = c0 + jnp.arange(w, dtype=normals_crop.dtype)[None, :] - cx
    row = r0 + jnp.arange(h, dtype=normals_crop.dtype)[:, None] - cy
    D = nx * col / fx + ny * row / fy + nz
    return D, nx / fx, ny / fy


@functools.partial(jax.jit, static_argnames=("config", "crop", "return_crops"))
def integrate_normals_cropped(
    normals: jax.Array,
    masks: jax.Array,
    K: jax.Array,
    config: BiniConfig = BiniConfig(),
    crop: int = 128,
    return_crops: bool = False,
) -> jax.Array:
    """Crop-based integration: each segment solves on a crop x crop window
    around its bounding box instead of the full field (SURVEY §7.1: segments
    as fixed-size masked crops with bbox metadata).

    EXACT for segments whose bbox fits the window: the linear system only
    couples in-mask pixels, all inside the bbox.  Segments with larger boxes
    are silently truncated — callers route those to :func:`integrate_normals`
    (see :func:`integrate_to_depth`'s auto dispatch in the frontend).

    Returns (N, H, W) log-depth fields scattered back to full resolution,
    or — with ``return_crops`` — the tuple ``(zt_crops (N, ch, cw), r0 (N,),
    c0 (N,))`` so the caller can scatter on the host; the crop form ships
    ~(H*W / crop^2)x fewer bytes over the host<->device link (the axon relay
    makes that a first-order cost for a 300-segment keyframe).
    """
    masks = masks.astype(bool)
    N, H, W = masks.shape
    crop_h = min(crop, H)
    crop_w = min(crop, W)

    any_r = masks.any(axis=2)
    any_c = masks.any(axis=1)
    top = jnp.argmax(any_r, axis=1)
    bottom = H - 1 - jnp.argmax(any_r[:, ::-1], axis=1)
    left = jnp.argmax(any_c, axis=1)
    right = W - 1 - jnp.argmax(any_c[:, ::-1], axis=1)
    h = bottom - top + 1
    w = right - left + 1
    r0 = jnp.clip(top - (crop_h - h) // 2, 0, max(H - crop_h, 0))
    c0 = jnp.clip(left - (crop_w - w) // 2, 0, max(W - crop_w, 0))

    crops_n = jax.vmap(
        lambda r, c: jax.lax.dynamic_slice(normals, (r, c, 0), (crop_h, crop_w, 3))
    )(r0, c0)
    crops_m = jax.vmap(
        lambda m, r, c: jax.lax.dynamic_slice(m, (r, c), (crop_h, crop_w))
    )(masks, r0, c0)

    D, c_u, c_v = jax.vmap(
        lambda n, r, c: _coefficients_window(n, K, r, c)
    )(crops_n, r0.astype(normals.dtype), c0.astype(normals.dtype))

    zt_crops = _solve_given_coeffs(D, c_u, c_v, crops_m, config)
    if return_crops:
        # _solve_given_coeffs already zeroes outside the mask
        return zt_crops, r0, c0

    out = jax.vmap(
        lambda z, r, c: jax.lax.dynamic_update_slice(
            jnp.zeros((H, W), z.dtype), z, (r, c)
        )
    )(zt_crops, r0, c0)
    return out * masks.astype(out.dtype)


def segment_bbox_sizes(masks_np):
    """Host-side bbox extents (h, w) per segment for crop/full routing.

    Vectorized: two (N, H, W) ``any`` reductions + argmax scans instead of a
    per-segment ``np.nonzero`` loop (which cost ~90 ms at 304 segments)."""
    import numpy as np

    masks_np = np.asarray(masks_np, bool)
    _, H, W = masks_np.shape
    any_r = masks_np.any(axis=2)                       # (N, H)
    any_c = masks_np.any(axis=1)                       # (N, W)
    nonempty = any_r.any(axis=1)
    top = any_r.argmax(axis=1)
    bottom = H - 1 - any_r[:, ::-1].argmax(axis=1)
    left = any_c.argmax(axis=1)
    right = W - 1 - any_c[:, ::-1].argmax(axis=1)
    hs = np.where(nonempty, bottom - top + 1, 0).astype(np.int64)
    ws = np.where(nonempty, right - left + 1, 0).astype(np.int64)
    return hs, ws


def integrate_to_depth(normals, masks, K, config: BiniConfig = BiniConfig()):
    """Depth-up-to-scale per segment: exp(log-depth), zero outside masks —
    the shape the frontend scatters back (normals_integration.py:24-28)."""
    zt = integrate_normals(normals, masks, K, config)
    return jnp.exp(zt) * masks.astype(zt.dtype)
