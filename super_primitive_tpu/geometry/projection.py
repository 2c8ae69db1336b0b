"""Pinhole projection / unprojection / rigid transforms in JAX.

Behavioral parity targets (verified element-wise in tests):
  - ``project``: eps-guarded 1/z exactly as core/ops.py:19-40 — points with
    |z| <= eps get z_inv = eps (NOT 1/eps; the reference multiplies by eps),
    which parks them near the principal point and lets the validity mask kill
    them.
  - ``unproject``: core/dense_optim.py:19-35 — x = (u - cx) z / fx.
  - ``transform``: R p + t (core/ops.py:5-17 einsum form).

All functions broadcast over leading batch dims; points are (..., N, 2|3) in
(u, v) = (col, row) image order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def transform(points: jax.Array, pose: jax.Array) -> jax.Array:
    """Apply pose(s) (..., 4, 4) to points (..., N, 3).

    Uses HIGHEST matmul precision: TPU matmuls default to bf16 passes, which
    is fine for the neural nets but not for pose geometry feeding a
    photometric residual.  The contraction is tiny (N x 3 x 3), so this costs
    nothing.
    """
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rotated = jnp.einsum(
        "...ij,...nj->...ni", R, points, precision=jax.lax.Precision.HIGHEST
    )
    return rotated + t[..., None, :]


def project(points: jax.Array, K: jax.Array) -> jax.Array:
    """Project (..., N, 3) camera-frame points with intrinsics (..., 3, 3).

    Returns (u, v) pixel coordinates (..., N, 2) with the reference's
    eps-guard: z_inv = eps where |z| <= eps (core/ops.py:33-34).
    """
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]

    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    z_inv = jnp.where(jnp.abs(z) > _EPS, 1.0 / jnp.where(jnp.abs(z) > _EPS, z, 1.0), _EPS)
    u = x * fx * z_inv + cx
    v = y * fy * z_inv + cy
    return jnp.stack([u, v], axis=-1)


def unproject(uv: jax.Array, depth: jax.Array, K: jax.Array) -> jax.Array:
    """Lift pixels (..., N, 2) in (u, v) order with depth (..., N) to 3D.

    x = (u - cx) z / fx, y = (v - cy) z / fy (core/dense_optim.py:19-35).
    """
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]

    z = depth
    x = (uv[..., 0] - cx) * z / fx
    y = (uv[..., 1] - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def scale_intrinsics(K: jax.Array, scale_yx) -> jax.Array:
    """Rescale K by per-axis image scale factors (y_scale, x_scale).

    Matches the reference's pyramid-intrinsics convention
    (image/gaussian_pyramid.py:42-50): K' = T K with
    T = [[sx, 0, sx], [0, sy, sy], [0, 0, 1]] — note the translation column
    carries the *scale factor itself*, the reference's (commented-out
    half-pixel variant rejected) convention.
    """
    sy, sx = scale_yx
    T = jnp.array([[sx, 0.0, sx], [0.0, sy, sy], [0.0, 0.0, 1.0]], dtype=K.dtype)
    return T @ K
