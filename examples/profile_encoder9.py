"""Minimal single-matmul MFU probe at the exact ViT-H tokenwise shapes.

profile_encoder8's 32-layer stacked-weight scan sat in the remote compiler
for >25 min without finishing (2026-08-18) — the relay compile service
chokes on scans carrying ~1.3 GB of stacked constants.  This probe answers
the same question with the smallest possible graphs: one matmul per shape,
repeated k times inside the dispatch with a data dependence so the compiler
cannot elide repeats, device time via k-repeat differencing (relay
constants cancel).

If the per-matmul MFU lands at ~30%, the shipped encoder's ~95 ms
non-attention time IS the chip's real matmul floor at these shapes (and
the roofline note in NOTES_NEXT should be corrected from 197 TF/s ideal
to the measured achievable).  If it lands at 60%+, ~half the encoder time
is XLA glue worth hunting.

CAVEAT (measured 2026-08-18): the scalar-feedback trick below was ELIDED
by XLA for some shapes — `proj` "measured" 2788 TF/s = 14x the chip peak,
because the simplifier distributes dot(h + bcast(s), W) and hoists the
loop-invariant dot out of the fori_loop.  Only the `lin1` number proved
trustworthy (133 TF/s, 68% MFU).  Do NOT trust the lin2/qkv/proj lines
from this script; profile_encoder10.py re-measures them with un-elidable
full-output chains.

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

    def probe(M, K, N, label, dt=jnp.bfloat16):
        W = jax.random.normal(rng, (K, N), dt) * 0.02
        x = jax.random.normal(rng, (M, K), dt)
        # data-dependent repeat: feed a scalar from the output back into the
        # input so the compiler cannot collapse the chain; the extra work is
        # one reduction + broadcast per repeat (bandwidth noise)
        def chain(k):
            def f(x):
                def body(i, h):
                    y = h @ W
                    s = y.astype(jnp.float32).mean() * 1e-6
                    return h + s.astype(h.dtype)

                out = jax.lax.fori_loop(0, k, body, x)
                return out.astype(jnp.float32).sum()

            return jax.jit(f)

        k1, k2 = 8, 24
        f1, f2 = chain(k1), chain(k2)
        t0 = time.perf_counter()
        sync(f1(x))
        sync(f2(x))
        print(f"  [{label}: compile {time.perf_counter() - t0:.0f}s]", flush=True)
        t1, t2 = [], []
        for _ in range(5):
            t0 = time.perf_counter(); sync(f1(x)); t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f2(x)); t2.append(time.perf_counter() - t0)
        per = (min(t2) - min(t1)) / (k2 - k1)
        fl = 2 * M * K * N
        print(
            f"{label:44s} {per * 1e3:7.3f} ms/matmul  "
            f"{fl / per / 1e12:6.1f} TFLOP/s  ({fl / per / 1.97e14 * 100:4.1f}% of 197TF)",
            flush=True,
        )

    print("== single-matmul MFU at ViT-H tokenwise shapes (bf16) ==", flush=True)
    probe(4900, 1280, 5120, "mlp_lin1 (4900,1280)@(1280,5120)")
    print(
        "  WARNING: the following probes were ELIDED by XLA when measured "
        "(proj hit 14x chip peak) — numbers below are NOT trustworthy; "
        "see profile_encoder10.py for the corrected methodology.",
        flush=True,
    )
    probe(4900, 5120, 1280, "mlp_lin2 (4900,5120)@(5120,1280)")
    probe(4900, 1280, 3840, "qkv      (4900,1280)@(1280,3840)")
    probe(4900, 1280, 1280, "proj     (4900,1280)@(1280,1280)")
    # same lin1 through the window-batched layout the blocks actually use
    probe(25 * 196, 1280, 5120, "lin1 flat M=4900 (control)")


if __name__ == "__main__":
    main()
