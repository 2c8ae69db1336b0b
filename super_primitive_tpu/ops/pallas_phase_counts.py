"""Pallas TPU kernel: fused phase-decomposed upsample threshold counts.

The SAM mask statistics (stability score + pixel area at model full
resolution; see nets/sam/predictor._phase_upsample_counts) are counts over
the bilinear s-upsample of low-res logits.  The phase decomposition avoids
materializing the upsampled grid, but as XLA ops the s^2 phases cost
3*s^2 full masked reductions over the (B*M, S, S) slab — ~32 ms of the
300-prompt select round's ~80 ms device time at s=4 (chip probe,
examples/probe_select_round2.py).

This kernel computes ALL s^2 phases in ONE VMEM pass per mask: the (S, S)
slab is read once, the 16 interpolants and their threshold counts live in
registers, and only three scalars per mask leave the kernel.

Math contract (identical to the jnp reference): clamped-edge shifts, phase
weights f = (k + .5)/s - .5, region mask (s*i + k) < input_hw — asserted
element-exact in tests/test_sam_pipeline.py (counts are integer-valued, so
float assoc differences cannot change them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_THRESHOLD = 0.0


def _clamped_shift(x, d, axis):
    """Shift by one with edge replication (matches concatenate-based shifts
    in the jnp reference).  d=+1 pulls the previous row/col (xm), d=-1 the
    next (xp)."""
    rolled = jnp.roll(x, d, axis=axis)
    S = x.shape[axis]
    i2 = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if d == 1:
        return jnp.where(i2 == 0, x, rolled)
    return jnp.where(i2 == S - 1, x, rolled)


def _kernel(s, x_ref, hw_ref, hi_ref, lo_ref, area_ref):
    x = x_ref[0]
    S = x.shape[-1]
    h_in = hw_ref[0]
    w_in = hw_ref[1]
    row_i = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xm_r = _clamped_shift(x, 1, 0)
    xp_r = _clamped_shift(x, -1, 0)
    hi = jnp.float32(0.0)
    lo = jnp.float32(0.0)
    area = jnp.float32(0.0)
    for ky in range(s):
        f = (ky + 0.5) / s - 0.5
        ry = (1 + f) * x - f * xm_r if f < 0 else (1 - f) * x + f * xp_r
        rym = _clamped_shift(ry, 1, 1)
        ryp = _clamped_shift(ry, -1, 1)
        rok = (s * row_i + ky) < h_in
        for kx in range(s):
            g = (kx + 0.5) / s - 0.5
            v = (1 + g) * ry - g * rym if g < 0 else (1 - g) * ry + g * ryp
            reg = (rok & ((s * col_i + kx) < w_in)).astype(jnp.float32)
            hi = hi + jnp.sum((v > MASK_THRESHOLD + 1.0) * reg)
            lo = lo + jnp.sum((v > MASK_THRESHOLD - 1.0) * reg)
            area = area + jnp.sum((v > MASK_THRESHOLD) * reg)
    n = pl.program_id(0)
    hi_ref[n] = hi
    lo_ref[n] = lo
    area_ref[n] = area


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def phase_counts_pallas(x, s: int, input_hw, interpret: bool = False):
    """(x (N, S, S) f32, s, input_hw (2,) int) -> (hi, lo, area) each (N,)."""
    N, S, _ = x.shape
    smem_vec = pl.BlockSpec(memory_space=pltpu.SMEM)
    hi, lo, area = pl.pallas_call(
        functools.partial(_kernel, s),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, S, S), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            smem_vec,
        ],
        out_specs=[smem_vec, smem_vec, smem_vec],
        out_shape=[jax.ShapeDtypeStruct((N,), jnp.float32)] * 3,
        interpret=interpret,
    )(x.astype(jnp.float32), jnp.asarray(input_hw, jnp.int32))
    return hi, lo, area
