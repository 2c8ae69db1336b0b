"""Where do the 26.3 ms/LM-iter of GN mapping go?  In-dispatch ablation.

The per-iteration cost of gn_mapping is one `assemble` pass (linearize +
reduce) plus a tiny Schur solve.  NOTES_NEXT's round-3 ledger attributes
~15 ms to the pooled tap gathers and ~9 ms to reductions, by A/B of shipped
variants.  This probe measures the pieces directly, inside one dispatch via
k-repeat differencing (relay constants cancel), with a carry feedback into
kp_logdepth so no repeat can be hoisted:

  A. gather-only     — project all (s,t) pairs, fetch pooled taps, sum them
  B. warp+J chain    — A + linearize_warp, J consumed by a flat sum
                       (no one-hot landmark reduction, no H10)
  C. full assemble   — the shipped pass (H, g, D, gl, Bs, cost)

C-B = landmark one-hot + H10/g10 einsums + camera scatters; B-A = the
closed-form Jacobian chain's VPU work.  Run alone on the chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench_mapping import build_window

    from super_primitive_tpu.cost import photometric as ph
    from super_primitive_tpu.geometry import projection
    from super_primitive_tpu.lie import se3
    from super_primitive_tpu.odometry import mapper
    from super_primitive_tpu.ops.sampling import (
        bilinear_cell_index,
        pack_bilinear_taps,
    )
    from super_primitive_tpu.solve import gn_mapping as gm

    buf, geo_dims = build_window()
    supp_valid = np.asarray(buf.supp_valid)
    slots = mapper.build_slots(buf.capacity, buf.capacity, supp_valid, "map")
    masks = mapper.build_masks(
        buf.capacity, buf.capacity, supp_valid, "map", buf.capacity, True, True
    )
    trg_index = jnp.asarray(slots.trg_index)
    trg_valid = jnp.asarray(slots.trg_valid)
    src_valid = jnp.asarray(slots.src_valid)
    par_mask = jnp.concatenate([
        jnp.repeat(jnp.asarray(masks.xi_mask), 6),
        jnp.repeat(jnp.asarray(masks.affine_mask), 2),
    ])
    geo = geo_dims
    W = buf.capacity
    T_max = trg_index.shape[1]
    trg_images = buf.image_pool()[trg_index]
    poses = buf.pose_pool()
    affine = buf.affine_pool()
    src_samples = buf.source_samples(geo)

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    # --- variant bodies: each maps a perturbed kp_logdepth -> scalar -------
    def taps_for_source(s, kp_ld, pool_packed):
        bundle = buf.bundle_at(s)
        logd = ph.spread_logdepth(bundle, kp_ld[s], buf.kp_base[s])
        X = projection.unproject(bundle.uv, jnp.exp(logd), buf.K[s])
        Hp, Wp, C4 = pool_packed.shape[-3:]

        def slot_cells(slot, t):
            rel0 = jnp.matmul(
                se3.inverse(poses[t]), poses[s],
                precision=jax.lax.Precision.HIGHEST,
            )
            p = projection.transform(X, rel0)
            uv = projection.project(p, buf.K[s])
            coords = ph.normalized_image_coords(uv, geo)
            idx, wx, wy, okb = bilinear_cell_index(coords, (Hp, Wp))
            return idx + slot * (Hp * Wp), wx, wy, okb

        idx_s, wx_s, wy_s, okb_s = jax.vmap(slot_cells)(
            jnp.arange(T_max), trg_index[s]
        )
        pool_s = pool_packed[s].reshape(T_max * Hp * Wp, C4)
        taps = jnp.take(pool_s, idx_s.reshape(-1), axis=0)
        return X, taps.reshape(T_max, -1, C4), (idx_s, wx_s, wy_s, okb_s)

    trg_packed = jax.vmap(jax.vmap(pack_bilinear_taps))(trg_images)

    def body_gather(kp_ld):
        def per_src(acc, s):
            _, taps, _ = taps_for_source(s, kp_ld, trg_packed)
            return acc + jnp.sum(taps[..., 0]), None

        out, _ = jax.lax.scan(per_src, jnp.zeros(()), jnp.arange(W))
        return out

    def body_warpj(kp_ld):
        def per_src(acc, s):
            bundle = buf.bundle_at(s)
            X, taps, (idx_s, wx_s, wy_s, okb_s) = taps_for_source(
                s, kp_ld, trg_packed
            )
            vstat = src_samples.valid[s] & bundle.valid
            Hp, Wp = trg_packed.shape[-3:-1]

            def one_slot(t, tap_rows, t_wx, t_wy, t_okb):
                rel0 = jnp.matmul(
                    se3.inverse(poses[t]), poses[s],
                    precision=jax.lax.Precision.HIGHEST,
                )
                r0, valid, J = gm.linearize_warp(
                    X, src_samples.pixels[s], vstat, rel0, buf.K[s], None,
                    geo, affine[s], affine[t], True,
                    taps=(tap_rows, t_wx, t_wy, t_okb), taps_hw=(Hp, Wp),
                )
                return jnp.sum(J) + jnp.sum(r0)

            v = jax.vmap(one_slot)(
                trg_index[s], taps, wx_s, wy_s, okb_s
            )
            return acc + jnp.sum(v), None

        out, _ = jax.lax.scan(per_src, jnp.zeros(()), jnp.arange(W))
        return out

    def body_full(kp_ld):
        H, g_t, D, gl, Bs, cost = gm.assemble(
            buf, trg_index, trg_valid, src_valid, trg_images, src_samples,
            par_mask, geo, True, poses, kp_ld, affine,
        )
        return cost + jnp.sum(H) * 1e-30 + jnp.sum(Bs) * 1e-30

    kp0 = buf.kp_logdepth

    def timed(body, label, k1=4, k2=12, reps=5):
        def chain(k):
            def f(kp):
                def it(i, c):
                    return c + body(kp + c * 1e-30) * 1e-20

                return jax.lax.fori_loop(0, k, it, jnp.zeros(()))

            return jax.jit(f)

        f1, f2 = chain(k1), chain(k2)
        t0 = time.perf_counter()
        sync(f1(kp0)); sync(f2(kp0))
        print(f"  [{label}: compile {time.perf_counter() - t0:.0f}s]", flush=True)
        t1, t2 = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); sync(f1(kp0)); t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f2(kp0)); t2.append(time.perf_counter() - t0)
        per = (min(t2) - min(t1)) / (k2 - k1)
        print(f"{label:34s} {per * 1e3:7.2f} ms/pass", flush=True)
        return per

    print("== mapping assemble ablation (5-KF window, 240x320) ==", flush=True)
    a = timed(body_gather, "A. project+pooled gather only")
    b = timed(body_warpj, "B. A + linearize_warp J chain")
    c = timed(body_full, "C. full assemble (shipped)")
    print(
        f"\nJ-chain (B-A) = {(b - a) * 1e3:.2f} ms; "
        f"reductions (C-B) = {(c - b) * 1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
