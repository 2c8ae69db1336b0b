"""Split the Adam-parity mapping iteration: forward cost vs value_and_grad
vs full optimizer step (k-repeat in-dispatch differencing).  VERDICT r2 #6
follow-up: the spread-gather custom VJP moved 71.2 -> 66.0 ms/iter; this
locates the remainder."""

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

    from super_primitive_tpu.cost import photometric as ph
    from super_primitive_tpu.odometry import mapper

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    buf, geo_dims = build_window()
    supp_valid = np.asarray(buf.supp_valid)
    slots = mapper.build_slots(buf.capacity, buf.capacity, supp_valid, "map")
    trg_index = jnp.asarray(slots.trg_index)
    trg_valid = jnp.asarray(slots.trg_valid)
    src_valid = jnp.asarray(slots.src_valid)

    trg_images = buf.image_pool()[trg_index]
    poses = buf.pose_pool()
    affine = buf.affine_pool()
    src_samples = buf.source_samples(geo_dims)
    W = buf.capacity

    def total_loss(kp_logdepth):
        def per_src(acc, s):
            bundle = buf.bundle_at(s)
            src = ph.SourceSamples(src_samples.pixels[s], src_samples.valid[s])
            rel = jax.vmap(
                lambda t: jnp.linalg.solve(poses[t], poses[s])
            )(trg_index[s])
            res = ph.photometric_cost_batch(
                bundle, src, trg_images[s], buf.K[s], geo_dims,
                kp_logdepth[s], buf.kp_base[s], rel,
            )
            gv = (trg_valid[s] & src_valid[s]).astype(res.dtype)
            return acc + jnp.sum(res * gv) / jnp.maximum(gv.sum(), 1), None

        out, _ = jax.lax.scan(per_src, jnp.zeros(()), jnp.arange(W))
        return out

    ld0 = buf.kp_logdepth

    def bench(make_body, label, k=8):
        @jax.jit
        def one():
            return make_body(ld0)

        @jax.jit
        def many():
            def body(c, _):
                r = make_body(ld0 + 1e-30 * c)
                return c + jax.tree.leaves(r)[0].ravel()[0], ()

            t, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
            return t

        sync(one())
        sync(many())
        t1 = min(
            time.perf_counter() - t0
            for t0 in [time.perf_counter()]
            for _ in [sync(one())]
        )
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(many())
            ts.append(time.perf_counter() - t0)
        tk = min(ts)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(one())
            ts.append(time.perf_counter() - t0)
        t1 = min(ts)
        dev = 1000 * (tk - t1) / (k - 1)
        print(f"{label:42s} {1000 * t1:7.1f} ms dispatch, {dev:7.1f} ms device")

    bench(total_loss, "forward cost only")
    bench(lambda ld: jax.value_and_grad(total_loss)(ld)[1], "value_and_grad")


if __name__ == "__main__":
    main()
