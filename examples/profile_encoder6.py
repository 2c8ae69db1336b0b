"""Round-3 encoder-floor bisection: where do the non-attention ~95 ms go?

Times, on the chip, bare chains of the encoder's constituent ops at the
exact shipped shapes/dtypes (bf16, persistent window layout 25x196x1280):

  A. dense-only block chain (qkv + proj + mlp matmuls, no LN/GELU/residual)
  B. the same chain flattened to (4900, 1280) before every Dense
  C. LayerNorm chain (norm1-equivalent) alone
  D. tanh-GELU chain on the MLP hidden width alone
  E. full shipped encoder for reference

Each chain is run as lax.scan over the 28 windowed blocks' worth of work;
device time is the marginal between scan lengths L and 2L inside single
dispatches (relay constants cancel).  If A ~= B the batched-window layout
is NOT hurting the matmuls; A vs E - (C + D + attention) bounds the
unexplained glue (residuals, pad re-zeroing, layout ops, scheduling).
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

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    def dev_time(make_fn, label, n1=28, n2=56, reps=3):
        """Marginal device ms for n2-n1 chain steps (dispatch cancels)."""
        f1, f2 = jax.jit(make_fn(n1)), jax.jit(make_fn(n2))
        sync(f1()); sync(f2())  # compile
        ts1, ts2 = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); sync(f1()); ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f2()); ts2.append(time.perf_counter() - t0)
        per = (min(ts2) - min(ts1)) / (n2 - n1) * 1000
        print(f"{label:58s} {per * 28:8.1f} ms /28blk ({per:6.2f} ms/blk)",
              flush=True)
        return per * 28

    rng = jax.random.PRNGKey(0)
    C, HID = 1280, 5120
    NW, WS2 = 25, 196  # windows x tokens at 1024^2 / 14-window persistent
    dt = jnp.bfloat16
    x0 = jax.random.normal(rng, (NW, WS2, C), dt)
    Wqkv = jax.random.normal(rng, (C, 3 * C), dt) * 0.02
    Wproj = jax.random.normal(rng, (C, C), dt) * 0.02
    W1 = jax.random.normal(rng, (C, HID), dt) * 0.02
    W2 = jax.random.normal(rng, (HID, C), dt) * 0.02

    def dense_block(x):
        qkv = x @ Wqkv
        v = qkv[..., 2 * C:]            # stand-in for attention output
        x = v @ Wproj
        h = x @ W1
        x = h @ W2
        return x / (1.0 + jnp.max(jnp.abs(x)))  # keep bf16 in range

    def make_windowed(n):
        def run():
            def body(x, _):
                return dense_block(x), None
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return out.sum()
        return run

    def make_flat(n):
        xf = x0.reshape(NW * WS2, C)
        def run():
            def body(x, _):
                return dense_block(x), None
            out, _ = jax.lax.scan(body, xf, None, length=n)
            return out.sum()
        return run

    def make_ln(n):
        g = jnp.ones((C,), dt); b = jnp.zeros((C,), dt)
        def run():
            def body(x, _):
                mu = x.mean(-1, keepdims=True)
                var = ((x - mu) ** 2).mean(-1, keepdims=True)
                y = (x - mu) / jnp.sqrt(var + 1e-6) * g + b
                return y, None
            out, _ = jax.lax.scan(body, x0, None, length=n)
            return out.sum()
        return run

    def make_gelu(n):
        h0 = jax.random.normal(rng, (NW, WS2, HID), dt)
        def run():
            def body(h, _):
                y = jax.nn.gelu(h, approximate=True)
                return y / (1.0 + jnp.max(jnp.abs(y))), None
            out, _ = jax.lax.scan(body, h0, None, length=n)
            return out.sum()
        return run

    print("== encoder-floor bisection (bf16, shipped shapes) ==", flush=True)
    a = dev_time(make_windowed, "A. dense chain, windowed layout (25,196,1280)")
    b = dev_time(make_flat, "B. dense chain, flat layout (4900,1280)")
    c = dev_time(make_ln, "C. LayerNorm chain (one LN/blk; x2 for norm1+2)")
    d = dev_time(make_gelu, "D. tanh-GELU chain on (25,196,5120)")

    # full encoder reference
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT

    base = dataclasses.replace(
        VIT_H, global_attn_impl="ext", windowed_attn_impl="ext",
        persistent_windows=True, gelu_approx=True,
    )
    enc = ImageEncoderViT(base)
    img = jax.random.normal(rng, (1, 1024, 1024, 3), jnp.bfloat16)
    p = jax.jit(enc.init)(rng, jnp.zeros((1, 1024, 1024, 3), jnp.bfloat16))["params"]
    p = jax.tree.map(lambda a_: a_.astype(jnp.bfloat16), p)
    f = jax.jit(lambda pp, x: enc.apply({"params": pp}, x).sum())
    t0 = time.perf_counter(); sync(f(p, img))
    print(f"  [encoder compile+run {time.perf_counter() - t0:.0f}s]", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); sync(f(p, img)); ts.append(time.perf_counter() - t0)
    e = 1000 * min(ts)
    print(f"{'E. full shipped encoder (wall, incl dispatch)':58s} {e:8.1f} ms",
          flush=True)
    print(f"\nmatmul roofline @197TF bf16: {28 * 24 * 4900 * C * C * 1e-9 / 197:.1f} ms"
          f" for the 28 windowed blocks' dense work", flush=True)
    print(f"accounted (A + 2C + D): {a + 2 * c + d:.1f} ms of E ~= {e:.1f} ms wall",
          flush=True)


if __name__ == "__main__":
    main()
