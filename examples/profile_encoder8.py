"""Encoder roofline probe: raw bf16 matmul throughput at the EXACT ViT-H
tokenwise shapes, vs the measured ~95 ms non-attention encoder time.

skip_pad_compute removed 19.6% of the tokenwise matmul FLOPs and moved the
encoder <1% (profile_encoder7), so the encoder is NOT FLOP-bound at a fixed
MFU.  This probe times ONLY the matmuls (32 blocks x qkv/proj/lin1/lin2 as a
scan over layer-stacked weights, no norms/softmax/residuals/layouts):

  - if this alone is ~60-90 ms, the shapes themselves deliver ~30% MFU on
    this chip and the encoder is already near its REAL matmul roofline;
  - if it is ~35 ms (the 197 TFLOP/s bf16 ideal), ~half the encoder time is
    harvestable overhead worth hunting.

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
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    L, C, M, D = 32, 1280, 4900, 5120  # depth, embed, tokens (padded), mlp
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 4)
    Wqkv = (jax.random.normal(ks[0], (L, C, 3 * C), jnp.bfloat16) * 0.02)
    Wproj = (jax.random.normal(ks[1], (L, C, C), jnp.bfloat16) * 0.02)
    W1 = (jax.random.normal(ks[2], (L, C, D), jnp.bfloat16) * 0.02)
    W2 = (jax.random.normal(ks[3], (L, D, C), jnp.bfloat16) * 0.02)
    x0 = jax.random.normal(r, (M, C), jnp.bfloat16)

    @jax.jit
    def matmuls_only(x):
        def body(h, w):
            wq, wp, w1, w2 = w
            a = h @ wq                      # (M, 3C)
            h = a[:, :C] @ wp               # proj on the q slice (same shape)
            m = h @ w1                      # (M, D)
            h = m @ w2                      # (M, C)
            return h, ()

        h, _ = jax.lax.scan(body, x, (Wqkv, Wproj, W1, W2))
        return h.astype(jnp.float32).sum()

    flops = 2 * L * (M * C * 3 * C + M * C * C + 2 * M * C * D)
    sync(matmuls_only(x0))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        sync(matmuls_only(x0))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(
        f"tokenwise matmuls only: {1000 * dt:.1f} ms wall "
        f"({flops / 1e12:.2f} TFLOP -> {flops / dt / 1e12:.0f} TFLOP/s)"
    )

    # same with the elementwise interludes the blocks actually run
    @jax.jit
    def matmuls_plus_elementwise(x):
        def body(h, w):
            wq, wp, w1, w2 = w
            mu = h.astype(jnp.float32).mean(-1, keepdims=True)
            var = ((h.astype(jnp.float32) - mu) ** 2).mean(-1, keepdims=True)
            n = ((h - mu.astype(h.dtype)) * jax.lax.rsqrt(var + 1e-6).astype(h.dtype))
            a = n @ wq
            o = a[:, :C] @ wp
            h = h + o
            mu2 = h.astype(jnp.float32).mean(-1, keepdims=True)
            var2 = ((h.astype(jnp.float32) - mu2) ** 2).mean(-1, keepdims=True)
            n2 = ((h - mu2.astype(h.dtype)) * jax.lax.rsqrt(var2 + 1e-6).astype(h.dtype))
            m = jax.nn.gelu(n2 @ w1, approximate=True)
            h = h + (m @ w2)
            return h, ()

        h, _ = jax.lax.scan(body, x, (Wqkv, Wproj, W1, W2))
        return h.astype(jnp.float32).sum()

    sync(matmuls_plus_elementwise(x0))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        sync(matmuls_plus_elementwise(x0))
        ts.append(time.perf_counter() - t0)
    print(
        f"+ norms/gelu/residuals:  {1000 * min(ts):.1f} ms wall "
        f"(elementwise adds {1000 * (min(ts) - dt):.1f} ms)"
    )


if __name__ == "__main__":
    main()
