"""Steady-state per-frame latency: the fused odometry frame step.

One dispatch = coarse-to-fine GN tracking + supporting-slot refresh +
'supp' logdepth refinement + KF gating (odometry/fused_step.py).  Reports
dispatch wall time AND marginal device time via in-dispatch repeats — the
device number is what a directly-attached TPU host would see per frame.

    python examples/bench_frame.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench_mapping import build_window
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.odometry import mapper
    from super_primitive_tpu.odometry.fused_step import fused_frame_step

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    buf, geo_dims = build_window()
    i = jnp.asarray(buf.capacity - 1)
    r = np.random.default_rng(0)
    # target = shifted copy of the KF image: the LM solver does real
    # alignment work for the full iteration budget (a random target makes
    # it bail immediately and under-measures)
    trg = jnp.roll(buf.images[-1], 3, axis=1)
    T_init = buf.poses[-1] @ se3.exp(jnp.asarray(0.01 * r.normal(size=6), jnp.float32))
    slots = mapper.build_slots(
        buf.capacity, buf.capacity, np.asarray(buf.supp_valid), "supp"
    )
    st_index = jnp.asarray(slots.trg_index[-1])
    st_valid = jnp.asarray(slots.trg_valid[-1])

    kwargs = dict(
        geo_dims=geo_dims, levels=(0, 1, 2), pyramid_min=0, pyramid_max=3,
        # the shipped TrackConfig default (schema.py: 30 matches Adam-300's
        # per-frame ATE); small-motion steady state early-stops well short
        # of the cap, so the budget mostly prices the worst case
        max_iters=30, use_affine=True, supp_max_iters=6,
    )

    def step(trg_image):
        return fused_frame_step(
            buf, i, trg_image, T_init, jnp.zeros(2),
            trg_image, T_init, jnp.zeros(2), jnp.asarray(True),
            st_index, st_valid, **kwargs,
        )

    out = step(trg)
    sync(out[1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(step(trg)[1])
        ts.append(time.perf_counter() - t0)
    one_ms = 1000 * min(ts)

    KREP = 4

    @jax.jit
    def step_k():
        def body(c, _):
            _, packed, _ = step(trg + 1e-30 * c)
            return c + packed[-1], ()
        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=KREP)
        return out

    sync(step_k())
    tk = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(step_k())
        tk.append(time.perf_counter() - t0)
    k_ms = 1000 * min(tk)
    dev_ms = (k_ms - one_ms) / (KREP - 1)
    print(
        f"fused frame step @ {geo_dims[0]}x{geo_dims[1]}: "
        f"{one_ms:.1f} ms/dispatch, {dev_ms:.1f} ms device "
        f"-> {1000.0 / dev_ms:.0f} FPS steady-state on an attached host",
        flush=True,
    )


if __name__ == "__main__":
    main()
