"""Sim(3) operations in pure JAX.

The reference treats Sim(3) implicitly — Horn alignment with scale for
display/evaluation (tool/pose_utils.py:71-133).  The group itself is
provided for completeness (monocular trajectory alignment, scale-drift
analysis): 4x4 matrices of the form [[s R, t], [0, 1]]; tangent
``xi = (omega[3], v[3], sigma)`` with scale s = exp(sigma).

Exponential follows the standard closed form (Strasdat; Sophus sim3):
t = W v with W = C I + A Wx + B Wx^2, all coefficients with series
fallbacks so values and gradients are finite at theta -> 0 and sigma -> 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

_EPS = 1e-6


def _w_coeffs(theta2: jax.Array, sigma: jax.Array, dtype):
    """(C, A, B) of W = C I + A Wx + B Wx^2."""
    small_t = theta2 < _EPS * _EPS
    small_s = jnp.abs(sigma) < _EPS
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta2))
    sigma_safe = jnp.where(small_s, 1.0, sigma)
    s = jnp.exp(sigma)

    C = jnp.where(small_s, 1.0 + 0.5 * sigma, (s - 1.0) / sigma_safe)

    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    c2 = theta2 + sigma * sigma
    c2_safe = jnp.where(c2 < _EPS * _EPS, 1.0, c2)

    # A: sigma ~ 0 -> (1 - cos)/theta^2 (or 1/2); else the mixed form
    A_s0 = jnp.where(small_t, 0.5 - theta2 / 24.0, (1.0 - cos_t) / jnp.where(small_t, 1.0, theta2))
    A_t0 = jnp.where(
        small_s, 0.5, ((sigma_safe - 1.0) * s + 1.0) / (sigma_safe * sigma_safe)
    )
    A_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (theta * c2_safe)
    A = jnp.where(small_s, A_s0, jnp.where(small_t, A_t0, A_gen))

    # B: sigma ~ 0 -> (theta - sin)/theta^3 (or 1/6); else the mixed form
    B_s0 = jnp.where(
        small_t, 1.0 / 6.0 - theta2 / 120.0,
        (theta - sin_t) / jnp.where(small_t, 1.0, theta2 * theta),
    )
    B_t0 = jnp.where(
        small_s, 1.0 / 6.0,
        ((0.5 * sigma_safe**2 - sigma_safe + 1.0) * s - 1.0) / sigma_safe**3,
    )
    B_gen = (
        C - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / c2_safe
    ) / jnp.where(small_t, 1.0, theta2)
    B = jnp.where(small_s, B_s0, jnp.where(small_t, B_t0, B_gen))
    return C.astype(dtype), A.astype(dtype), B.astype(dtype)


def exp(xi: jax.Array) -> jax.Array:
    """Sim(3) exponential: (..., 7) [omega, v, sigma] -> (..., 4, 4)."""
    w = xi[..., :3]
    v = xi[..., 3:6]
    sigma = xi[..., 6]
    R = so3.exp(w)
    s = jnp.exp(sigma)

    theta2 = jnp.sum(w * w, axis=-1)
    C, A, B = _w_coeffs(theta2, sigma, xi.dtype)

    Wx = so3.hat(w)
    Wx2 = jnp.matmul(Wx, Wx, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), Wx.shape)
    Wmat = C[..., None, None] * eye + A[..., None, None] * Wx + B[..., None, None] * Wx2
    t = jnp.squeeze(
        jnp.matmul(Wmat, v[..., None], precision=jax.lax.Precision.HIGHEST), -1
    )

    batch = xi.shape[:-1]
    T = jnp.zeros(batch + (4, 4), xi.dtype)
    T = T.at[..., :3, :3].set(s[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def scale_of(T: jax.Array) -> jax.Array:
    """Recover s from a Sim(3) matrix (det(sR) = s^3)."""
    return jnp.cbrt(jnp.linalg.det(T[..., :3, :3]))


def log(T: jax.Array) -> jax.Array:
    """Sim(3) logarithm: (..., 4, 4) -> (..., 7) [omega, v, sigma]."""
    s = scale_of(T)
    sigma = jnp.log(s)
    R = T[..., :3, :3] / s[..., None, None]
    w = so3.log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    C, A, B = _w_coeffs(theta2, sigma, T.dtype)
    Wx = so3.hat(w)
    Wx2 = jnp.matmul(Wx, Wx, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), Wx.shape)
    Wmat = C[..., None, None] * eye + A[..., None, None] * Wx + B[..., None, None] * Wx2
    v = jnp.linalg.solve(Wmat, T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)


def inverse(T: jax.Array) -> jax.Array:
    s = scale_of(T)
    R = T[..., :3, :3] / s[..., None, None]
    t = T[..., :3, 3]
    sR_inv = jnp.swapaxes(R, -2, -1) / s[..., None, None]
    t_inv = -jnp.squeeze(
        jnp.matmul(sR_inv, t[..., None], precision=jax.lax.Precision.HIGHEST), -1
    )
    batch = T.shape[:-2]
    out = jnp.zeros(batch + (4, 4), T.dtype)
    out = out.at[..., :3, :3].set(sR_inv)
    out = out.at[..., :3, 3].set(t_inv)
    out = out.at[..., 3, 3].set(1.0)
    return out


def from_scale_rot_trans(s, R, t) -> jax.Array:
    batch = jnp.shape(R)[:-2]
    T = jnp.zeros(batch + (4, 4))
    T = T.at[..., :3, :3].set(jnp.asarray(s)[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
