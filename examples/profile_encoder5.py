"""Round-3 A/B #3: heads-in-place extended attention (ext_hp) vs shipped
default on the persistent-window bf16 encoder."""

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
        sync(fn(*a))
        print(f"  [compile+run {time.perf_counter() - t0:.0f}s]", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        print(f"{label:52s} {1000 * min(ts):8.1f} ms", flush=True)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
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
        ("shipped default (persistent+ext+gelu~)", {}),
        ("windowed ext_hp", {"windowed_attn_impl": "ext_hp"}),
        ("windowed+global ext_hp",
         {"windowed_attn_impl": "ext_hp", "global_attn_impl": "ext_hp"}),
    ):
        cfg = dataclasses.replace(base, **opts)
        enc = ImageEncoderViT(cfg)
        f = jax.jit(lambda pp, x, enc=enc: enc.apply({"params": pp}, x))
        bench(lambda pp, x, f=f: f(pp, x).sum(), p, img, label=label)
        outs[label] = np.asarray(f(p, img), np.float32)

    ref = outs["shipped default (persistent+ext+gelu~)"]
    for k, v in outs.items():
        if v is not ref:
            print(f"max|{k} - default| = {np.max(np.abs(v - ref)):.5f}")


if __name__ == "__main__":
    main()
