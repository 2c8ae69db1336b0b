"""On-chip A/B of SAM global-attention lowerings (round-2 perf work).

Times the FULL ViT-H encoder at 1024^2 in bf16 under each global-attention
impl ("xla" materialized bias / "ext" extended-head matmul / "flash" Pallas
kernel), plus an all-windowed ablation that bounds what the 4 global blocks
cost in situ, and cross-checks flash vs xla numerics on the same params.
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
    import dataclasses

    import jax.numpy as jnp

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT

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
        print(f"{label:46s} {ms:8.1f} ms", flush=True)
        return ms

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
    enc0 = ImageEncoderViT(VIT_H)
    p = jax.jit(enc0.init)(rng, img)["params"]
    # non-zero rel-pos tables so the rel math isn't trivially zero
    p = jax.tree.map(lambda a: (a + 0.02) if a.ndim == 2 else a, p)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

    outs = {}
    for impl in ("xla", "ext", "flash"):
        cfg = dataclasses.replace(VIT_H, global_attn_impl=impl)
        enc = ImageEncoderViT(cfg)
        f = jax.jit(lambda pp, x, enc=enc: enc.apply({"params": pp}, x))
        try:
            bench(lambda pp, x, f=f: f(pp, x).sum(), p, img,
                  label=f"full encoder impl={impl}")
            outs[impl] = np.asarray(f(p, img), np.float32)
        except Exception as e:
            print(f"impl={impl} FAILED: {type(e).__name__}: {e}", flush=True)

    for impl in ("ext", "flash"):
        if impl in outs and "xla" in outs:
            d = np.max(np.abs(outs[impl] - outs["xla"]))
            s = np.max(np.abs(outs["xla"]))
            print(f"max|{impl} - xla| = {d:.5f}  (scale {s:.3f})", flush=True)

    cfg_w = dataclasses.replace(VIT_H, global_attn_indexes=())
    enc_w = ImageEncoderViT(cfg_w)
    bench(
        lambda pp, x: enc_w.apply({"params": pp}, x).sum(), p, img,
        label="full encoder ALL-WINDOWED (ablation)",
    )


if __name__ == "__main__":
    main()
