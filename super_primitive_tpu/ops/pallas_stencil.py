"""Pallas TPU kernel: fused BiNI normal-equation apply.

The BiNI PCG inner loop (integrate/bini.py) applies
A p = sum_d G_d^T (q_d * G_d p) — 4 one-sided difference stencils, each a
shift + multiply + adjoint shift — plus the <p, Ap> dot product.  As separate
XLA ops each field makes multiple HBM round trips per iteration; this kernel
performs the whole apply in ONE VMEM pass per segment and emits the
per-segment <p, Ap> partial alongside.

Grid: one program per segment; a (H, W) f32 slab (~300 KB at 240x320) plus
the four edge-weight fields fit comfortably in VMEM.  Shifts use jnp.roll —
wrap-around contamination is impossible because the q fields zero all border
edges (integrate/bini._edge_masks invalidates the wrapped sides).

``bini_apply`` falls back to pure-jnp (identical math) off-TPU or under
``interpret=True`` for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_math(p, q_up, q_um, q_vp, q_vm):
    """The fused apply body (shared between kernel and fallback).

    forward-u diff:  d(p)[r, c] = p[r, c+1] - p[r, c]
    its adjoint:     a(y)[r, c] = y[r, c-1] - y[r, c]
    (and symmetric for the other three directions)
    """
    def sh(x, dr, dc):
        # single-axis rolls only: a 0-shift component lowers to an empty
        # slice that Mosaic rejects
        if dr:
            x = jnp.roll(x, dr, axis=-2)
        if dc:
            x = jnp.roll(x, dc, axis=-1)
        return x

    y_up = q_up * (sh(p, 0, -1) - p)
    y_um = q_um * (p - sh(p, 0, 1))
    y_vp = q_vp * (sh(p, -1, 0) - p)
    y_vm = q_vm * (p - sh(p, 1, 0))

    out = (
        (sh(y_up, 0, 1) - y_up)
        + (y_um - sh(y_um, 0, -1))
        + (sh(y_vp, 1, 0) - y_vp)
        + (y_vm - sh(y_vm, -1, 0))
    )
    return out


def _kernel(p_ref, q_up_ref, q_um_ref, q_vp_ref, q_vm_ref, ap_ref, dot_ref):
    # blocks are (1, H, W); operate on 2D slabs (Mosaic cannot roll across a
    # leading singleton dim)
    p = p_ref[0]
    ap = _apply_math(p, q_up_ref[0], q_um_ref[0], q_vp_ref[0], q_vm_ref[0])
    ap_ref[0] = ap
    # dot_ref maps the WHOLE (N,) vector into SMEM; each program writes its
    # own slot (a (1,)-blocked SMEM output would violate TPU tiling rules)
    dot_ref[pl.program_id(0)] = jnp.sum(p * ap)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bini_apply_pallas(p, q_up, q_um, q_vp, q_vm, interpret: bool = False):
    """Fused A-apply over (N, H, W) fields -> (Ap (N, H, W), pAp (N,))."""
    N, H, W = p.shape
    block = pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
    ap, dots = pl.pallas_call(
        _kernel,
        grid=(N,),
        in_specs=[block] * 5,
        out_specs=[
            block,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W), p.dtype),
            jax.ShapeDtypeStruct((N,), p.dtype),
        ],
        interpret=interpret,
    )(p, q_up, q_um, q_vp, q_vm)
    return ap, dots


def bini_apply_reference(p, q_up, q_um, q_vp, q_vm):
    """Pure-jnp fallback with identical math (used off-TPU)."""
    ap = _apply_math(p, q_up, q_um, q_vp, q_vm)
    return ap, jnp.sum(p * ap, axis=(-2, -1))


def bini_apply(p, q_up, q_um, q_vp, q_vm):
    """Dispatch: Pallas on TPU, plain jnp elsewhere."""
    if jax.default_backend() == "tpu":
        return bini_apply_pallas(p, q_up, q_um, q_vp, q_vm)
    return bini_apply_reference(p, q_up, q_um, q_vp, q_vm)


# --------------------------------------------------------------------------
# Whole-solver kernel: the complete Jacobi-PCG runs INSIDE one Pallas program
# per segment with every field resident in VMEM.  The host-level PCG pays a
# dispatch + HBM round trip per CG iteration; at segment-crop sizes that
# fixed cost dominates (measured: runtime nearly independent of crop size).
# In-kernel, one CG step is ~40 VPU ops on a VMEM-resident field.
# --------------------------------------------------------------------------


def _cg_kernel_body(max_iter: int, tol: float):
    def kernel(b_ref, x0_ref, mask_ref, diag_ref,
               q_up_ref, q_um_ref, q_vp_ref, q_vm_ref, out_ref):
        mask = mask_ref[0]
        b = b_ref[0] * mask
        q = (q_up_ref[0], q_um_ref[0], q_vp_ref[0], q_vm_ref[0])
        diag = diag_ref[0]
        inv_diag = jnp.where(diag > 1e-12, 1.0 / jnp.where(diag > 1e-12, diag, 1.0), 0.0)

        def apply_A(p):
            return _apply_math(p, *q) * mask

        def dot(a, c):
            return jnp.sum(a * c * mask)

        x = x0_ref[0] * mask
        r = (b - apply_A(x)) * mask
        z = r * inv_diag * mask
        p = z
        rz = dot(r, z)
        b_norm = jnp.sqrt(dot(b, b))
        thresh = jnp.maximum(tol, 5e-7) * jnp.maximum(b_norm, 1e-30)
        r_norm0 = jnp.sqrt(dot(r, r))

        def active(r_norm, best):
            return jnp.logical_not(
                jnp.logical_or(r_norm <= thresh, r_norm > 10.0 * best + 1e-30)
            )

        def cond(state):
            x, r, z, p, rz, x_best, best, it = state
            r_norm = jnp.sqrt(dot(r, r))
            return jnp.logical_and(it < max_iter, active(r_norm, best))

        def body(state):
            x, r, z, p, rz, x_best, best, it = state
            r_norm = jnp.sqrt(dot(r, r))
            improved = r_norm < best
            x_best = jnp.where(improved, x, x_best)
            best = jnp.minimum(best, r_norm)
            Ap = apply_A(p)
            pAp = dot(p, Ap)
            alpha = jnp.where(pAp > 1e-30, rz / jnp.where(pAp > 1e-30, pAp, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = r * inv_diag * mask
            rz_new = dot(r, z)
            beta = jnp.where(rz > 1e-30, rz_new / jnp.where(rz > 1e-30, rz, 1.0), 0.0)
            p = z + beta * p
            return (x, r, z, p, rz_new, x_best, best, it + 1)

        x, r, _, _, _, x_best, best, _ = jax.lax.while_loop(
            cond, body, (x, r, z, p, rz, x, r_norm0, jnp.int32(0))
        )
        r_norm = jnp.sqrt(dot(r, r))
        out_ref[0] = jnp.where(r_norm < best, x, x_best)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_iter", "tol", "interpret"))
def bini_cg_pallas(
    b, x0, mask, diag, q_up, q_um, q_vp, q_vm,
    max_iter: int, tol: float, interpret: bool = False,
):
    """Full per-segment Jacobi-PCG in one Pallas program (grid over N).

    Math identical to integrate.bini._pcg (tolerance floor, best-iterate
    tracking, divergence freeze) — verified against it in tests.
    """
    N, H, W = b.shape
    block = pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _cg_kernel_body(max_iter, tol),
        grid=(N,),
        in_specs=[block] * 8,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((N, H, W), b.dtype),
        interpret=interpret,
    )(b, x0, mask, diag, q_up, q_um, q_vp, q_vm)
