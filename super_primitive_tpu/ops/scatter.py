"""Scatter depth rendering (z-buffer-free splat).

Reference: core/ops.py:59-96 ``estimate_depth_diff`` — project points, round
to integer pixels, scatter z into an (H, W) image; used for keyframe gating
and depth re-initialization (odometery.py:294-321, 986-1016).

The reference's ``scatter_`` keeps an *arbitrary* colliding point (CUDA
scheduling order).  We use a deterministic **min** reduction instead — a true
z-buffer — which is well-defined under XLA and strictly more physical; the
``mean`` mode matches the reference's ``scatter_reduce_('mean')`` option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import projection

Z_VALID = 1e-6  # reference core/ops.py:60


def render_depth(
    points: jax.Array,
    K: jax.Array,
    dims: tuple[int, int],
    valid: jax.Array | None = None,
    mean: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Scatter-render 3D points into an (H, W) depth image.

    ``points`` (P, 3) camera-frame; returns (depth (H, W), point_valid (P,)).
    Pixels with no points are 0.  Reference rounds projected (u, v) by
    truncation via ``.long()`` after ``flip``; we match the int cast
    semantics (toward zero; coordinates are non-negative in range anyway).
    """
    H, W = dims
    z = points[..., 2]
    ok = z > Z_VALID
    if valid is not None:
        ok = ok & valid

    uv = projection.project(points, K)
    # reference: project -> flip(-1) -> long  => (row, col) = int(v), int(u)
    col = uv[..., 0].astype(jnp.int32)
    row = uv[..., 1].astype(jnp.int32)
    # validity uses the same bounds as core/ops.py:78 (x<H, y<W on (row, col))
    ok = ok & (row >= 0) & (row < H) & (col >= 0) & (col < W)

    idx = jnp.where(ok, row * W + col, H * W)  # overflow slot for invalid

    if mean:
        total = jnp.zeros(H * W + 1, points.dtype).at[idx].add(
            jnp.where(ok, z, 0.0), mode="drop"
        )
        count = jnp.zeros(H * W + 1, points.dtype).at[idx].add(
            ok.astype(points.dtype), mode="drop"
        )
        depth = jnp.where(count[: H * W] > 0, total[: H * W] / jnp.maximum(count[: H * W], 1), 0.0)
    else:
        buf = jnp.full(H * W + 1, jnp.inf, points.dtype).at[idx].min(
            jnp.where(ok, z, jnp.inf), mode="drop"
        )
        depth = jnp.where(jnp.isinf(buf[: H * W]), 0.0, buf[: H * W])

    return depth.reshape(H, W), ok
