"""On-chip A/B of SAM *windowed*-attention lowerings (round-3 perf work).

VERDICT r2 #1: set_image is ~190 ms device at ~12% MFU, spread across the 28
windowed blocks.  This measures the FULL ViT-H encoder (1024^2 bf16, the
exact set_image workload) under:

  - baseline: xla windowed + ext global (the predictor's bf16 config)
  - windowed "ext" (rel-pos folded into the QK contraction)
  - persistent window layout (partition once per windowed run)
  - persistent + windowed ext
  - identity-windowed-attention ablation (matmul/LN floor)

plus numerics cross-checks of every variant vs baseline.
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
        ms = 1000 * min(ts)
        print(f"{label:52s} {ms:8.1f} ms", flush=True)
        return ms

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
    base = dataclasses.replace(VIT_H, global_attn_impl="ext")
    enc0 = ImageEncoderViT(base)
    p = jax.jit(enc0.init)(rng, jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16))["params"]
    p = jax.tree.map(lambda a: (a + 0.02) if a.ndim == 2 else a, p)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

    variants = [
        ("baseline (xla windowed, ext global)", {}),
        ("windowed ext", {"windowed_attn_impl": "ext"}),
        ("persistent windows", {"persistent_windows": True}),
        ("persistent + windowed ext",
         {"persistent_windows": True, "windowed_attn_impl": "ext"}),
    ]
    outs = {}
    for label, opts in variants:
        cfg = dataclasses.replace(base, **opts)
        enc = ImageEncoderViT(cfg)
        f = jax.jit(lambda pp, x, enc=enc: enc.apply({"params": pp}, x))
        try:
            bench(lambda pp, x, f=f: f(pp, x).sum(), p, img, label=label)
            outs[label] = np.asarray(f(p, img), np.float32)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {e}", flush=True)

    ref_label = variants[0][0]
    for label in outs:
        if label != ref_label and ref_label in outs:
            d = np.max(np.abs(outs[label] - outs[ref_label]))
            s = np.max(np.abs(outs[ref_label]))
            print(f"max|{label} - baseline| = {d:.5f}  (scale {s:.3f})", flush=True)

    # floor: windowed attention score/softmax/AV skipped (qkv/proj kept) —
    # bounds everything-but-attention by difference vs baseline
    for label, opts in (
        ("ABLATION windowed attn skip", {"windowed_attn_impl": "skip"}),
        ("ABLATION windowed attn skip + persistent",
         {"windowed_attn_impl": "skip", "persistent_windows": True}),
    ):
        cfg = dataclasses.replace(base, **opts)
        enc = ImageEncoderViT(cfg)
        f = jax.jit(lambda pp, x, enc=enc: enc.apply({"params": pp}, x).sum())
        bench(f, p, img, label=label)


if __name__ == "__main__":
    main()
