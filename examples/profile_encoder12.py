"""True device time of the FULL shipped ViT-H encode via k-differencing.

profile_encoder11 bounds the blocks at 28*W1 + 4*G1 = 67.1 ms, yet the
shipped encoder "measures" ~97.7 ms.  Two hypotheses for the ~30 ms gap:
  (a) the 97.7 includes host->device upload + feature fetch + relay
      scheduling (it was wall-minus-RTT of one dispatch);
  (b) the real 32-distinct-weight graph runs slower per block than a
      reused-weight fori_loop (weights stream from HBM, scheduling).

This probe measures the full encoder twice:
  1. single-dispatch wall (what the frontend pays per keyframe), and
  2. k-repeat in-dispatch differencing with a scalar fed back into the
     image (true marginal device time; relay constants + transfers cancel).

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

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    cfg = dataclasses.replace(
        VIT_H, global_attn_impl="ext", windowed_attn_impl="ext",
        persistent_windows=True, gelu_approx=True,
    )
    enc = ImageEncoderViT(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(enc.init)(jax.random.PRNGKey(1), img)["params"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )
    print(f"[init {time.perf_counter() - t0:.0f}s]", flush=True)

    img_b = img.astype(jnp.bfloat16)

    @jax.jit
    def encode1(x):
        return enc.apply({"params": params}, x).astype(jnp.float32).sum()

    def chain(k):
        @jax.jit
        def f(x):
            def body(i, c):
                s = enc.apply(
                    {"params": params}, x + (c * 1e-30).astype(x.dtype)
                ).astype(jnp.float32).sum()
                return c + s * 1e-20

            return jax.lax.fori_loop(0, k, body, jnp.zeros(()))

        return f

    t0 = time.perf_counter()
    sync(encode1(img_b))
    print(f"[encode1 compile+run {time.perf_counter() - t0:.0f}s]", flush=True)
    w = []
    for _ in range(7):
        t0 = time.perf_counter(); sync(encode1(img_b)); w.append(time.perf_counter() - t0)
    print(f"single-dispatch wall: {1000 * min(w):.1f} ms (min of 7)", flush=True)

    f1, f2 = chain(2), chain(5)
    t0 = time.perf_counter()
    sync(f1(img_b)); sync(f2(img_b))
    print(f"[chains compile {time.perf_counter() - t0:.0f}s]", flush=True)
    t1, t2 = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sync(f1(img_b)); t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(f2(img_b)); t2.append(time.perf_counter() - t0)
    per = (min(t2) - min(t1)) / 3
    print(
        f"k-differenced device time: {per * 1e3:.1f} ms/encode "
        f"(vs 67.1 ms block budget; delta = embed/neck/partitions +"
        f" distinct-weight streaming)",
        flush=True,
    )


if __name__ == "__main__":
    main()


# NEGATIVE RESULT (2026-08-18): the k-differenced chains above never
# finished compiling through the relay (killed after 45 min on the single
# encode1 graph) — same failure mode as profile_encoder8's stacked-weight
# scan.  Full-ViT-H-sized graphs wrapped in NEW jit entry points recompile
# from scratch and the relay compiler cannot be budgeted for them.  The
# actionable encoder ledger therefore comes from profile_encoder11 (real
# Block in isolation: windowed 1.896 ms, global 3.493 ms, block budget
# 67.1 ms) + the shipped predictor's cached-program wall.
