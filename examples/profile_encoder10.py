"""Un-elidable encoder compute chains: where do the non-attention ~95 ms go?

profile_encoder9's scalar-feedback repeat was ELIDED by XLA for some shapes
(proj measured 2788 TF/s, 14x the chip peak — the simplifier distributes
dot(h + bcast(s), W) and hoists the loop-invariant dot).  Here every chain
feeds the FULL matmul output into the next matmul, which no algebraic
rewrite can collapse:

  A. real MLP (LN2 + lin1 + tanh-GELU + lin2 + residual), windowed layout
  B. qkv + proj pair (LN1 + qkv, proj on the q slice, residual)
  C. full block minus attention math (A + B chained; the shipped encoder's
     skip-ablation measured 94.9 ms for exactly this plus layout glue)

All at the shipped shapes/dtype: (25, 196, 1280) bf16, 28 windowed blocks'
worth via k-repeat differencing inside one dispatch (relay constants
cancel).  Compare C x 28 against the 94.9 ms skip-ablation: the difference
is glue OUTSIDE the block math (pad re-zeroing, window (un)partition at run
boundaries, global-block layout changes, scheduling).

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
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    rng = jax.random.PRNGKey(0)
    C, HID = 1280, 5120
    NW, T = 25, 196
    dt = jnp.bfloat16
    x0 = jax.random.normal(rng, (NW, T, C), dt)
    Wq = jax.random.normal(rng, (C, 3 * C), dt) * 0.02
    Wp = jax.random.normal(rng, (C, C), dt) * 0.02
    W1 = jax.random.normal(rng, (C, HID), dt) * 0.02
    W2 = jax.random.normal(rng, (HID, C), dt) * 0.02
    g = jnp.ones((C,), dt)
    b = jnp.zeros((C,), dt)

    def ln(x):
        # flax semantics: stats in f32, output cast back
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype) * g + b

    def mlp_block(h):
        y = jax.nn.gelu(ln(h) @ W1, approximate=True) @ W2
        return h + y * 0.01  # damp so bf16 stays in range over 42 iterations
        # (k2=42; full_block chains two sub-blocks -> 84 matmul pairs max)

    def qkv_block(h):
        # Consume ALL of q, k, v so the simplifier cannot sink a slice into
        # the weight operand and elide 2/3 of the (C, 3C) dot (advisor
        # round-3 finding: a bare `[..., :C]` slice-of-dot lets XLA compute
        # only a (C, C) matmul while we credit full qkv FLOPs).
        qkv = ln(h) @ Wq
        q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
        return h + ((q + 0.01 * (k + v)) @ Wp) * 0.01

    def full_block(h):
        return mlp_block(qkv_block(h))

    def timed(body, label, flops_per_step, k1=14, k2=42, reps=5):
        def chain(k):
            def f(x):
                return jax.lax.fori_loop(0, k, lambda i, h: body(h), x) \
                    .astype(jnp.float32).sum()

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
        print(
            f"{label:46s} {per * 1e3:7.3f} ms/blk  x28 = {per * 28e3:6.1f} ms"
            f"   ({flops_per_step / per / 1e12:5.1f} TFLOP/s)",
            flush=True,
        )
        return per

    M = NW * T
    fl_mlp = 2 * M * C * HID * 2
    fl_qkv = 2 * M * C * 3 * C + 2 * M * C * C
    print("== un-elidable block chains (bf16, shipped shapes) ==", flush=True)
    timed(mlp_block, "A. LN+lin1+GELU+lin2+res (the real MLP)", fl_mlp)
    timed(qkv_block, "B. LN+qkv+proj+res", fl_qkv)
    c = timed(full_block, "C. full block minus attention", fl_mlp + fl_qkv)
    print(
        f"\nC x 28 = {c * 28e3:.1f} ms vs 94.9 ms skip-ablation -> "
        f"{94.9 - c * 28e3:.1f} ms of glue outside the block math",
        flush=True,
    )


if __name__ == "__main__":
    main()
