"""Time the REAL encoder Block in isolation — localize the ~64 ms of glue.

profile_encoder10 (corrected, un-elidable chains) measured the pure
non-attention block math at 1.109 ms/block (173.7 TF/s) -> 31.1 ms for the
28 windowed blocks, vs the encoder skip-ablation's 94.9 ms: ~64 ms of glue
somewhere.  This probe times the SHIPPED Block module (windowed,
pre_windowed persistent layout, bf16, tanh GELU) via k-repeat differencing
of one real Block applied repeatedly (one block's weights ~36 MB — safe as
a fori_loop closure constant; stacked-weight scans choke the relay
compiler, see profile_encoder8 note), in ablation rungs:

  W0. impl='skip' windowed block  — qkv/proj/MLP + repack transposes +
      pad re-zero, NO scores/softmax/AV/rel-pos
  W1. impl='ext'  windowed block  — the shipped full block
  G1. impl='ext'  global block    — at (1, 64, 64, 1280)

W1 x 28 + G1 x 4 + patch-embed/neck vs the shipped 97.7 ms closes the
budget; W0 - C(=1.109) is the layout glue; W1 - W0 is attention+rel-pos.

Run alone on the chip.
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
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, Block

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    cfg = dataclasses.replace(
        VIT_H, global_attn_impl="ext", windowed_attn_impl="ext",
        persistent_windows=True, gelu_approx=True,
    )
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    # persistent-window layout at 64x64 tokens / window 14: 5x5 windows of
    # 14x14, pad_mask zeroing the 6-row/col pad strip
    NW, ws = 25, 14
    xw0 = jax.random.normal(rng, (NW, ws, ws, 1280), dt)
    ones = jnp.ones((1, 64, 64, 1), dt)
    from super_primitive_tpu.nets.sam.image_encoder import window_partition

    pad_mask, _ = window_partition(ones, ws)
    xg0 = jax.random.normal(rng, (1, 64, 64, 1280), dt)

    def timed(mk_block, x0, extra, label, k1=7, k2=21, reps=5):
        blk = mk_block()
        params = blk.init(jax.random.PRNGKey(1), x0, *extra)["params"]
        params = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)

        def chain(k):
            def f(x):
                def body(i, h):
                    out = blk.apply({"params": params}, h, *extra)
                    return h + (out - h) * 0.03  # damp; keeps real dataflow

                return jax.lax.fori_loop(0, k, body, x).astype(jnp.float32).sum()

            return jax.jit(f)

        f1, f2 = chain(k1), chain(k2)
        t0 = time.perf_counter()
        sync(f1(x0)); sync(f2(x0))
        print(f"  [{label}: compile {time.perf_counter() - t0:.0f}s]", flush=True)
        t1, t2 = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); sync(f1(x0)); t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f2(x0)); t2.append(time.perf_counter() - t0)
        per = (min(t2) - min(t1)) / (k2 - k1)
        print(f"{label:44s} {per * 1e3:7.3f} ms/block", flush=True)
        return per

    print("== real-Block ablation (bf16, persistent windows) ==", flush=True)
    cfg_skip = dataclasses.replace(cfg, windowed_attn_impl="skip")
    w0 = timed(
        lambda: Block(cfg_skip, ws, pre_windowed=True, grid=(5, 5, 8, 8)),
        xw0, (pad_mask,), "W0. windowed, attention SKIPPED",
    )
    w1 = timed(
        lambda: Block(cfg, ws, pre_windowed=True, grid=(5, 5, 8, 8)),
        xw0, (pad_mask,), "W1. windowed, full (shipped)",
    )
    g1 = timed(
        lambda: Block(cfg, 0), xg0, (), "G1. global, full (shipped)", k1=4, k2=12
    )
    print(
        f"\nW0 - pure-math C(1.109) = {(w0 - 1.109e-3) * 1e3:+.3f} ms/blk layout glue"
        f"\nW1 - W0 = {(w1 - w0) * 1e3:+.3f} ms/blk attention+rel-pos"
        f"\nbudget: 28*W1 + 4*G1 = {28 * w1 * 1e3 + 4 * g1 * 1e3:.1f} ms"
        f" vs shipped encoder ~97.7 ms (rest = embed/neck/window"
        f" (un)partition at run boundaries)",
        flush=True,
    )


if __name__ == "__main__":
    main()
