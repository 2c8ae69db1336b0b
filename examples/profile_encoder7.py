"""Round-3 A/B: skip_pad_compute on the shipped bf16 ViT-H encoder.

Persistent window layout pays tokenwise work (norm1/norm2/MLP/qkv/proj) on
4900 tokens where only 4096 are valid (19.6% pad at 64x64 grid, window 14).
skip_pad_compute routes that work through four static valid-token slices.
Expected saving if matmul-bound: ~16% of the non-attention time; the A/B
also reports the output delta (valid tokens must match to bf16 noise).
"""

import dataclasses
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

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def bench(fn, *a, reps=5, label=""):
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        print(f"  [compile+run {time.perf_counter() - t0:.0f}s]", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{label:52s} {1000 * min(ts):8.1f} ms", flush=True)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
    # shipped production config (predictor.py): persistent+ext+gelu_approx
    base = dataclasses.replace(
        VIT_H, global_attn_impl="ext", windowed_attn_impl="ext",
        persistent_windows=True, gelu_approx=True,
    )
    enc0 = ImageEncoderViT(base)
    p = jax.jit(enc0.init)(rng, jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16))["params"]
    p = jax.tree.map(lambda a: (a + 0.02) if a.ndim == 2 else a, p)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

    outs = {}
    for label, opts in (
        ("shipped (persistent+ext+tanh)", {}),
        ("+ skip_pad_compute", {"skip_pad_compute": True}),
    ):
        cfg = dataclasses.replace(base, **opts)
        enc = ImageEncoderViT(cfg)
        f = jax.jit(lambda pp, x, enc=enc: enc.apply({"params": pp}, x))
        bench(lambda pp, x, f=f: f(pp, x).sum(), p, img, label=label)
        outs[label] = np.asarray(f(p, img), np.float32)

    ks = list(outs)
    d = np.max(np.abs(outs[ks[1]] - outs[ks[0]]))
    print(f"max|skip - plain| = {d:.5f} (scale {np.max(np.abs(outs[ks[0]])):.3f})")


if __name__ == "__main__":
    main()
