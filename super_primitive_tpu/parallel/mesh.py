"""Device mesh + sharding layout for multi-chip scaling.

The reference is strictly single-GPU (SURVEY §2.2: no collectives anywhere);
multi-chip is therefore a TPU-native *extension*, designed SPMD-first:

  - mesh axes: ``dp`` over target frames (the mapping batch B) and ``sp``
    over bundle points (the dominant per-point axis P) — the two honest
    parallel dimensions of the photometric problem;
  - images are replicated (small); per-point arrays shard over ``sp``;
    per-target arrays shard over ``dp``;
  - the masked-L1 reduction and parameter gradients contract over both axes,
    so XLA inserts psum/reduce-scatter collectives over ICI automatically
    under jit with these output shardings — no hand-written collectives
    needed at this scale.

Used by ``__graft_entry__.dryrun_multichip`` and by multi-chip benchmarks.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """2D (dp, sp) mesh over the first n devices; dp gets the smaller factor."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    devs = np.asarray(devs[:n])
    # sp (points) is the large axis; give dp a factor of 2 when available
    dp = 2 if (n % 2 == 0 and n >= 4) else 1
    sp = n // dp
    return Mesh(devs.reshape(dp, sp), axis_names=("dp", "sp"))


def bundle_sharding(mesh: Mesh) -> NamedSharding:
    """Per-point arrays: shard the leading P axis over sp, replicate over dp."""
    return NamedSharding(mesh, P("sp"))


def target_sharding(mesh: Mesh) -> NamedSharding:
    """Per-target-frame arrays: shard the leading B axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_bundle(bundle, mesh: Mesh):
    """Place a PointBundle with points sharded over sp (scalars replicated)."""
    ps = bundle_sharding(mesh)
    rep = replicated(mesh)
    return type(bundle)(
        uv=jax.device_put(bundle.uv, ps),
        seg_id=jax.device_put(bundle.seg_id, ps),
        base_logdepth=jax.device_put(bundle.base_logdepth, ps),
        valid=jax.device_put(bundle.valid, ps),
        num_valid=jax.device_put(bundle.num_valid, rep),
    )


def shard_window(buffers, mesh: Mesh):
    """Place WindowBuffers for multi-chip mapping: the bundle-point axis
    (axis 1 of every (W, P, ...) array) shards over ``sp``; everything else
    replicates.

    This is all a sharded GN/Adam mapping solve needs: the per-point warp
    and linearization are pointwise over P (zero communication), and the
    normal-equation reductions contract over P, so GSPMD inserts one psum
    per reduction over ICI.  The tiny Schur solve replicates.  Verified
    equal to the unsharded solve in tests/test_multichip.py.
    """
    point_sharded = NamedSharding(mesh, P(None, "sp"))
    rep = replicated(mesh)

    def place(name, x):
        if name in ("uv", "seg_id", "base_logdepth", "point_valid"):
            return jax.device_put(x, point_sharded)
        return jax.device_put(x, rep)

    return type(buffers)(**{
        f: place(f, getattr(buffers, f))
        for f in buffers.__dataclass_fields__
    })
