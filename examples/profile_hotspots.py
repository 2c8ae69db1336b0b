"""On-chip bisection of the two remaining hot paths (round-2 perf work):

  A. SAM ViT-H image encoder (~272 ms warm set_image; ~12% MFU) — time the
     full encoder, then steady-state per-block-type (windowed x28 /
     global x4), each with and without decomposed rel-pos, plus an MLP-only
     block and the patch-embed+neck, to locate where the 10x-off-roofline
     time actually goes.
  B. GN mapping (~95 ms/LM-iter) — per-iteration slope from max_iters
     sweeps, standalone vmapped linearize_warp, and the one-hot segment
     matmul at fp32-HIGHEST vs DEFAULT vs bf16-in/fp32-acc.

Timing discipline per .claude/skills/verify: fetch a scalar (block_until_ready
is unreliable on the axon relay); run alone on the chip.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--part", choices=["enc", "map", "map2", "map3", "all"], default="all"
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import flax.linen as nn
    import jax.numpy as jnp

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def bench(fn, *a, reps=5, label=""):
        out = fn(*a)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        ms = 1000 * min(ts)
        print(f"{label:46s} {ms:8.1f} ms")
        return ms

    if args.part in ("enc", "all"):
        from super_primitive_tpu.nets.sam.image_encoder import (
            VIT_H, Attention, Block, ImageEncoderViT,
        )

        cfg = VIT_H
        rng = jax.random.PRNGKey(0)
        print("== A. SAM ViT-H encoder bisection (bf16) ==")

        # full encoder
        enc = ImageEncoderViT(cfg)
        img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
        p_enc = jax.jit(enc.init)(rng, img)["params"]
        p_enc = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p_enc)
        full = jax.jit(lambda p, x: enc.apply({"params": p}, x).sum())
        bench(full, p_enc, img, label="full encoder @1024")

        x = jax.random.normal(rng, (1, 64, 64, cfg.embed_dim), jnp.bfloat16)

        def steady(mod, n, label, x0=x):
            p = jax.jit(mod.init)(rng, x0)["params"]
            p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

            @jax.jit
            def run(p, h):
                def body(h, _):
                    return mod.apply({"params": p}, h), None
                h, _ = jax.lax.scan(body, h, None, length=n)
                return h.sum()

            return bench(run, p, x0, label=f"{label} x{n}")

        steady(Block(cfg, cfg.window_size), 28, "windowed block")
        steady(Block(cfg, 0), 4, "global block")

        class BlockNoRel(nn.Module):
            window_size: int

            @nn.compact
            def __call__(self, h):
                from super_primitive_tpu.nets.sam.image_encoder import (
                    window_partition, window_unpartition,
                )
                x0 = h
                h = nn.LayerNorm(epsilon=1e-6)(h)
                if self.window_size > 0:
                    H, W = h.shape[1], h.shape[2]
                    h, pad_hw = window_partition(h, self.window_size)
                h = Attention(cfg.num_heads, use_rel_pos=False)(h)
                if self.window_size > 0:
                    h = window_unpartition(h, self.window_size, pad_hw, (x0.shape[1], x0.shape[2]))
                x1 = x0 + h
                h = nn.LayerNorm(epsilon=1e-6)(x1)
                h = nn.Dense(int(cfg.embed_dim * 4))(h)
                h = nn.gelu(h, approximate=False)
                h = nn.Dense(cfg.embed_dim)(h)
                return x1 + h

        steady(BlockNoRel(cfg.window_size), 28, "windowed block, NO rel-pos")
        steady(BlockNoRel(0), 4, "global block, NO rel-pos")

        class MLPOnly(nn.Module):
            @nn.compact
            def __call__(self, h):
                x1 = nn.LayerNorm(epsilon=1e-6)(h)
                x1 = nn.Dense(int(cfg.embed_dim * 4))(x1)
                x1 = nn.gelu(x1, approximate=False)
                x1 = nn.Dense(cfg.embed_dim)(x1)
                return h + x1

        steady(MLPOnly(), 32, "MLP-only block (LN+mlp+res)")

        class AttnOnlyW(nn.Module):
            @nn.compact
            def __call__(self, h):
                from super_primitive_tpu.nets.sam.image_encoder import (
                    window_partition, window_unpartition,
                )
                x0 = h
                h = nn.LayerNorm(epsilon=1e-6)(h)
                H, W = h.shape[1], h.shape[2]
                h, pad_hw = window_partition(h, cfg.window_size)
                h = Attention(cfg.num_heads, input_size=(cfg.window_size, cfg.window_size))(h)
                h = window_unpartition(h, cfg.window_size, pad_hw, (x0.shape[1], x0.shape[2]))
                return x0 + h

        steady(AttnOnlyW(), 28, "attn-only windowed (LN+attn+res)")

    if args.part == "map3":
        # marginal DEVICE time of assemble vs solve_step via in-dispatch
        # repeats (single-shot probes are relay-RTT-bound, ~30 ms)
        print("== B3. gn_mapping assemble/solve marginal device time ==")
        import jax.numpy as jnp

        from bench_mapping import build_window
        from super_primitive_tpu.odometry import mapper
        from super_primitive_tpu.solve import gn_mapping as gm

        buf, map_dims = build_window()
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(buf.capacity, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            buf.capacity, buf.capacity, supp_valid, "map", buf.capacity, True, True
        )
        trg_index = jnp.asarray(slots.trg_index)
        trg_valid = jnp.asarray(slots.trg_valid)
        src_valid = jnp.asarray(slots.src_valid)
        W = buf.capacity
        S = buf.supp_capacity
        B = W + W * S
        N = buf.kp_logdepth.shape[1]
        par_mask = jnp.concatenate([
            jnp.repeat(jnp.asarray(masks.xi_mask), 6),
            jnp.repeat(jnp.asarray(masks.affine_mask), 2),
        ])
        ld_w = (jnp.asarray(masks.ld_mask) * buf.kf_valid.astype(jnp.float32))[
            :, None
        ] * jnp.ones((1, N))
        cmap = gm.build_cmap(trg_index, B)
        trg_images = buf.image_pool()[trg_index]
        src_samples = buf.source_samples(map_dims)
        poses0 = buf.pose_pool()
        affine0 = buf.affine_pool()

        KREP = 8

        def asm(ld):
            return gm.assemble(
                buf, trg_index, trg_valid, src_valid, trg_images, src_samples,
                par_mask, map_dims, True, poses0, ld, affine0,
            )

        @jax.jit
        def asm1():
            return asm(buf.kp_logdepth)[5]

        @jax.jit
        def asmK():
            def body(c, _):
                return c + asm(buf.kp_logdepth + 1e-30 * c)[5], ()
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=KREP)
            return out

        t1 = bench(asm1, label="assemble x1 (dispatch)")
        tK = bench(asmK, label=f"assemble x{KREP} (one dispatch)")
        print(f"{'assemble marginal device':46s} {(tK - t1) / (KREP - 1):8.1f} ms")

        lin = jax.jit(lambda: asm(buf.kp_logdepth))()
        H_, g_, D_, gl_, Bs_, _ = jax.tree.map(jnp.asarray, lin)

        @jax.jit
        def sol1(lam):
            return gm.solve_step(H_, g_, D_, gl_, Bs_, lam, ld_w, par_mask, cmap)[0].sum()

        @jax.jit
        def solK(lam):
            def body(c, _):
                return c + sol1(lam + 1e-30 * c), ()
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=KREP)
            return out

        s1 = bench(sol1, jnp.asarray(1e-3), label="solve_step x1 (dispatch)")
        sK = bench(solK, jnp.asarray(1e-3), label=f"solve_step x{KREP} (one dispatch)")
        print(f"{'solve_step marginal device':46s} {(sK - s1) / (KREP - 1):8.1f} ms")

        # full chained iteration (assemble -> solve -> apply) WITHOUT the
        # accept/reject tree-where — isolates the LM bookkeeping cost
        from super_primitive_tpu.lie import se3 as _se3

        def chain_body(carry, _):
            ld, lam = carry
            H, g, D, gl, Bs, cost = asm(ld)
            d_theta, d_l = gm.solve_step(H, g, D, gl, Bs, lam, ld_w, par_mask, cmap)
            return (ld + d_l * 1e-6, lam + 1e-30 * cost), ()

        @jax.jit
        def chain1():
            (ld, _), _ = jax.lax.scan(chain_body, (buf.kp_logdepth, jnp.asarray(1e-3)), None, length=1)
            return ld.sum()

        @jax.jit
        def chainK():
            (ld, _), _ = jax.lax.scan(chain_body, (buf.kp_logdepth, jnp.asarray(1e-3)), None, length=KREP)
            return ld.sum()

        c1 = bench(chain1, label="asm+solve+apply x1 (dispatch)")
        cK = bench(chainK, label=f"asm+solve+apply x{KREP} (one dispatch)")
        print(f"{'asm+solve+apply marginal device':46s} {(cK - c1) / (KREP - 1):8.1f} ms")

    if args.part in ("map", "map2", "all"):
        print("== B. GN mapping bisection ==")
        import jax.numpy as jnp

        from bench_mapping import build_window
        from super_primitive_tpu.odometry import mapper
        from super_primitive_tpu.solve.gn_mapping import gn_mapping, linearize_warp
        from super_primitive_tpu.cost import photometric as ph

        buf, map_dims = build_window()
        supp_valid = np.asarray(buf.supp_valid)
        slots = mapper.build_slots(buf.capacity, buf.capacity, supp_valid, "map")
        masks = mapper.build_masks(
            buf.capacity, buf.capacity, supp_valid, "map", buf.capacity, True, True
        )
        sargs = (
            jnp.asarray(slots.trg_index), jnp.asarray(slots.trg_valid),
            jnp.asarray(slots.src_valid),
            jnp.asarray(masks.xi_mask), jnp.asarray(masks.ld_mask),
            jnp.asarray(masks.affine_mask),
        )

        times = {}
        for k in (() if args.part == "map2" else (1, 3, 7)):
            def run_map(k=k):
                return gn_mapping(
                    buf, *sargs, map_dims, max_iters=k, use_affine=True, tol=0.0
                ).final_cost
            times[k] = bench(jax.jit(run_map), label=f"gn_mapping max_iters={k}")
        if times:
            print(
                f"{'per-LM-iter (slope 3->7)':46s} {(times[7] - times[3]) / 4:8.1f} ms"
            )
            print(
                f"{'lin0+dispatch (intercept)':46s} {times[1] - (times[3]-times[1])/2:8.1f} ms"
            )

        # standalone vmapped linearize over T=6 slots, one source
        T_max = slots.trg_index.shape[1]
        P = buf.uv.shape[1]
        r = np.random.default_rng(3)
        X = jnp.asarray(r.uniform(0.5, 2.0, (P, 3)).astype(np.float32))
        src_px = jnp.asarray(r.uniform(0, 1, (P, 3)).astype(np.float32))
        vstat = jnp.asarray(np.ones(P, bool))
        rels = jnp.tile(jnp.eye(4)[None], (T_max, 1, 1))
        Kj = buf.K[0]
        imgs = jnp.asarray(r.uniform(0, 1, (T_max, *map_dims, 3)).astype(np.float32))
        a0 = jnp.zeros(2)

        @jax.jit
        def lin6():
            def one(rel, img):
                r0, valid, J = linearize_warp(
                    X, src_px, vstat, rel, Kj, img, map_dims, a0, a0, True
                )
                return r0.sum() + J.sum()
            return jax.vmap(one)(rels, imgs).sum()

        lt = bench(lin6, label="linearize_warp vmapped x6 (1 src)")
        print(f"{'  -> x5 sources':46s} {5 * lt:8.1f} ms")

        # one-hot segment matmul precision variants
        N = buf.kp_logdepth.shape[1]
        seg_id = jnp.asarray(r.integers(0, N, P).astype(np.int32))
        payload = jnp.asarray(r.normal(size=(T_max, P, 18)).astype(np.float32))

        for prec, name in (
            (jax.lax.Precision.HIGHEST, "HIGHEST"),
            (jax.lax.Precision.DEFAULT, "DEFAULT"),
        ):
            @jax.jit
            def onehot_mm(payload, prec=prec):
                onehot = (jnp.arange(N)[:, None] == seg_id[None, :]).astype(jnp.float32)
                return jnp.einsum("np,tpk->tnk", onehot, payload, precision=prec).sum()
            bench(onehot_mm, payload, label=f"one-hot segmatmul x1src fp32 {name}")

        @jax.jit
        def onehot_bf16(payload):
            onehot = (jnp.arange(N)[:, None] == seg_id[None, :]).astype(jnp.bfloat16)
            return jnp.einsum(
                "np,tpk->tnk", onehot, payload.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).sum()
        bench(onehot_bf16, payload, label="one-hot segmatmul x1src bf16/fp32acc")

        # segment-sort scatter alternative: sort-free .at[].add on points
        @jax.jit
        def scatter_add(payload):
            return jnp.zeros((T_max, N, 18)).at[:, seg_id].add(payload).sum()
        bench(scatter_add, payload, label="scatter-add alternative x1src")


if __name__ == "__main__":
    main()
