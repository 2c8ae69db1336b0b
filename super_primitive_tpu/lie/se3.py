"""SE(3) operations in pure JAX — the lietorch replacement.

The reference delegates SE(3) exp/retraction/autograd to the lietorch
C++/CUDA extension (reference: lie/lie_algebra.py:177-188, install.sh:12-16).
Closed-form JAX implementations are differentiable by construction and fuse
into the surrounding XLA program, so the native extension is deleted rather
than ported.

Tangent layout: ``xi = (omega[3], v[3])`` — rotation first, translation last,
matching the reference's delta layout (its ``se3_exp`` re-orders to lietorch's
translation-first convention at the boundary, lie/lie_algebra.py:177-181, and
its ``SE3_logmap`` returns ``cat(w, V_inv t)``, lie/lie_algebra.py:247-258).

Poses are 4x4 homogeneous matrices (..., 4, 4), world-from-camera or
camera-from-camera depending on call site, exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

_EPS = 1e-8


def _v_coeffs(theta2: jax.Array, dtype) -> tuple[jax.Array, jax.Array]:
    """Coefficients (B, C) of V = I + B*W + C*W^2 with series fallbacks.

    B = (1 - cos t)/t^2,  C = (t - sin t)/t^3.
    """
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta)
    )
    return B.astype(dtype), C.astype(dtype)


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential: tangent (..., 6) [omega, v] -> pose (..., 4, 4)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3.exp(w)

    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    B, C = _v_coeffs(theta2, xi.dtype)
    W = so3.hat(w)
    WW = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + B * W + C * WW
    t = jnp.squeeze(jnp.matmul(V, v[..., None], precision=jax.lax.Precision.HIGHEST), axis=-1)

    return _rt_to_mat(R, t)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm: pose (..., 4, 4) -> tangent (..., 6) [omega, v]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3.log(R)

    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    # V^{-1} = I - W/2 + D * W^2 with D = (1 - (t/2) cot(t/2)) / t^2
    cot_term = half * jnp.cos(half) / jnp.sin(half)
    D = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot_term) / theta2_safe)
    W = so3.hat(w)
    WW = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V_inv = eye - 0.5 * W + D * WW
    v = jnp.squeeze(jnp.matmul(V_inv, t[..., None], precision=jax.lax.Precision.HIGHEST), axis=-1)
    return jnp.concatenate([w, v], axis=-1)


def _rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (reference: lie/lie_algebra.py:191-197)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = -jnp.squeeze(jnp.matmul(R_inv, t[..., None], precision=jax.lax.Precision.HIGHEST), axis=-1)
    return _rt_to_mat(R_inv, t_inv)


def renormalize(T: jax.Array) -> jax.Array:
    """Re-project the rotation block onto SO(3) via the quaternion round trip.

    Called after every retraction, matching the reference's
    ``renormalise_se3`` usage (odometery/odometery.py:867,880).
    """
    R = so3.renormalize(T[..., :3, :3])
    return T.at[..., :3, :3].set(R)


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right retraction ``T * exp(xi)`` with renormalization.

    This is the fold-delta-into-pose update of the reference's mapping and
    tracking loops (``batch_se3``: poses_new = poses @ exp(delta),
    lie/lie_algebra.py:184-188; fold-and-zero at odometery/odometery.py:860-882).
    """
    return renormalize(jnp.matmul(T, exp(xi), precision=jax.lax.Precision.HIGHEST))


def from_quat_trans(q_xyzw: jax.Array, t: jax.Array) -> jax.Array:
    """TUM-style (x, y, z, w) quaternion + translation -> 4x4 pose."""
    q_wxyz = jnp.concatenate([q_xyzw[..., 3:], q_xyzw[..., :3]], axis=-1)
    return _rt_to_mat(so3.quat_to_matrix(q_wxyz), t)


def to_quat_trans(T: jax.Array) -> tuple[jax.Array, jax.Array]:
    """4x4 pose -> TUM-style ((x, y, z, w) quaternion, translation)."""
    q_wxyz = so3.matrix_to_quat(T[..., :3, :3])
    q_xyzw = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    return q_xyzw, T[..., :3, 3]


def random(key: jax.Array, batch: tuple = (), sigma: float = 0.05) -> jax.Array:
    """Random pose near identity: exp of a Gaussian tangent with std sigma.

    Stand-in for lietorch ``SE3.Random`` used to noise GT init
    (odometery/two_frame_sfm.py:80).
    """
    xi = sigma * jax.random.normal(key, batch + (6,))
    return exp(xi)
