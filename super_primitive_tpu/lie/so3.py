"""SO(3) operations in pure JAX.

Replaces the reference's lietorch CUDA extension and hand-rolled torch maps
(reference: lie/lie_algebra.py:205-245) with closed-form, jit/vmap/grad-safe
implementations.  All functions broadcast over leading batch dimensions.

Conventions:
  - rotation vectors ("omega") are axis-angle, shape (..., 3);
  - quaternions are stored (w, x, y, z) real-first internally
    (``quat_to_matrix``/``matrix_to_quat``); helpers for the TUM-style
    (x, y, z, w) layout live in trajectory code.

Small-angle safety: every division by theta uses the double-``where`` trick so
both the value and the gradient are finite at theta -> 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3).

    Matches reference semantics of lie/lie_algebra.py:235-245.
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula: axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    Uses series expansions of sin(t)/t and (1-cos t)/t^2 near zero so the map
    and its gradient are exact at the identity.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < _EPS
    # Guarded theta2 for the "large" branch so sqrt/div never see ~0.
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)

    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)

    W = hat(w)
    WW = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * WW


def log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Behavioral parity with the reference's SO3_logmap
    (lie/lie_algebra.py:223-231): series fallback for small angles.  We route
    through the quaternion for robustness near pi (the reference's acos-based
    form is ill-conditioned there; our tests only require round-trip accuracy).
    """
    q = matrix_to_quat(R)
    return quat_to_rotvec(q)


def quat_to_rotvec(q: jax.Array) -> jax.Array:
    """(w, x, y, z) quaternion -> axis-angle, robust (value AND gradient) at
    small angles: the vector norm is computed via the double-where trick so
    backprop through an identity rotation stays finite."""
    q = q * jnp.sign(q[..., :1] + jnp.where(q[..., :1] == 0, 1.0, 0.0))
    w, xyz = q[..., 0], q[..., 1:]
    n2 = jnp.sum(xyz * xyz, axis=-1)
    small = n2 < _EPS  # switch to series below |xyz| ~ 1e-4
    n_safe = jnp.sqrt(jnp.where(small, 1.0, n2))
    angle = 2.0 * jnp.arctan2(jnp.where(small, 0.0, n_safe), w)
    # scale = angle / n; series: 2/w * (1 - n^2/(3 w^2))
    w_safe = jnp.where(jnp.abs(w) < _EPS, 1.0, w)
    scale = jnp.where(
        small, (2.0 / w_safe) * (1.0 - n2 / (3.0 * w_safe * w_safe)), angle / n_safe
    )
    return xyz * scale[..., None]


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit-normalizing quaternion (w, x, y, z) -> rotation matrix.

    Same normalization-by-2/|q|^2 trick as the reference
    (lie/lie_algebra.py:11-38), so non-unit quaternions are handled.
    """
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w, x, y, z), best-conditioned branch.

    Branchless JAX version of the pytorch3d-derived converter the reference
    uses (lie/lie_algebra.py:60-119): compute the quaternion via all four
    candidate denominators and select the largest-|q| one with a one-hot.
    """
    batch = R.shape[:-2]
    m = R.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., i] for i in range(9)]

    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    # Grad-safe sqrt(max(x, 0)): a plain sqrt has an infinite derivative at 0
    # which turns into NaN through the zero-weighted unselected branches.
    pos = q_abs2 > 1e-8
    q_abs = jnp.where(pos, jnp.sqrt(jnp.where(pos, q_abs2, 1.0)), 0.0)

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=R.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=R.dtype)
    return jnp.sum(quat_candidates * onehot[..., None], axis=-2)


def renormalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation back onto SO(3) via the quaternion round trip.

    Exact analog of the reference's renormalise_se3 rotation-block treatment
    (lie/lie_algebra.py:41-47), applied after every retraction step.
    """
    return quat_to_matrix(matrix_to_quat(R))


def rotvec_to_quat(w: jax.Array) -> jax.Array:
    """Axis-angle -> quaternion (w, x, y, z), small-angle safe."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([qw[..., None], w * k[..., None]], axis=-1)
