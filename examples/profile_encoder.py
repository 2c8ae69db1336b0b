#!/usr/bin/env python
"""SAM ViT-H encoder performance probe — the ONE maintained methodology.

This consolidates the round-3/4 probe lineage (profile_encoder2..14); the
superseded scripts are deleted.  Two modes, both relay-safe (no fresh
full-ViT-H jit — those never finish compiling through the axon relay):

  --mode encode   True full-encoder DEVICE throughput via k-repeat pipelined
                  dispatches of the production ``SamPredictor._encode_u8``
                  jit (persistent-cache hit).  Image pre-uploaded once; k
                  back-to-back async dispatches, sync only the last:
                  (T_k - T_1)/(k - 1) cancels every per-call constant that
                  overlaps device execution.  This is PIPELINED throughput —
                  the frontend critical path pays the single-dispatch number
                  (T_1), which is also printed.

  --mode blocks   Shipped-Block ablation at one-block granularity via
                  k-repeat fori_loop differencing (one block's ~36 MB of
                  weights as a closure constant; stacked-weight scans choke
                  the relay compiler):
                    W0  windowed block, attention SKIPPED (layout glue only)
                    W1  windowed block, full (shipped config)
                    G1  global block, full
                  Budget: 28*W1 + 4*G1 vs the --mode encode number; the
                  difference is embed/neck/boundary (un)partition work.

Measurement ledger (chip, round 4 — re-measure before trusting):
  pure non-attention block math  1.109 ms/blk (173.7 TF/s = 88% MFU)
  W0 (glue)                      +0.29 ms/blk     W1 (attn+relpos) +0.50
  28*W1 + 4*G1 = 67.1 ms of blocks;  pipelined encode ~71 ms;  single
  dispatch ~97 ms (carries upload + relay constants).
Discredited methodologies (do NOT resurrect):
  - fresh top-level jit of the full encoder (enc8/enc12): never compiles
    through the relay (killed at 45 min);
  - elided-matmul chains (enc9): XLA dead-code-eliminates the repeats,
    numbers were bogus;
  - warm-wall-minus-RTT subtraction (bench_frontend legacy): bills the
    encoder for the image upload (+~26 ms).

Run alone on the chip (single-chip relay — never share the TPU).
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _sync(x):
    leaf = __import__("jax").tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def mode_encode(k: int = 8, reps: int = 4):
    import jax
    import jax.numpy as jnp

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.predictor import (
        SamPredictor,
        get_preprocess_shape,
    )
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    cfg = VIT_H
    S = cfg.img_size // cfg.patch_size
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    enc = ImageEncoderViT(cfg)
    pe = PromptEncoder(
        embed_dim=cfg.out_chans, image_embedding_size=(S, S),
        input_image_size=(cfg.img_size, cfg.img_size),
    )
    dec = MaskDecoder(transformer_dim=cfg.out_chans)
    t0 = time.perf_counter()
    params = {
        "image_encoder": jax.jit(enc.init)(
            k1, jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        )["params"],
        "prompt_encoder": pe.init(
            k2, jnp.zeros((1, 2, 2)), jnp.zeros((1, 2))
        )["params"],
        "mask_decoder": dec.init(
            k3, jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((2, 2, cfg.out_chans)),
            jnp.zeros((2, S, S, cfg.out_chans)),
        )["params"],
    }
    print(f"init {time.perf_counter() - t0:.0f}s", flush=True)
    pred = SamPredictor(params, cfg, compute_dtype=jnp.bfloat16)

    r = np.random.default_rng(0)
    h2, w2 = get_preprocess_shape(960, 1280, cfg.img_size)
    img_dev = jax.device_put(r.integers(0, 255, (h2, w2, 3), np.uint8))

    f, ep = pred._encode_u8, pred._enc_params
    t0 = time.perf_counter()
    _sync(f(ep, img_dev))
    print(f"warm/compile: {time.perf_counter() - t0:.1f}s", flush=True)

    for rep in range(reps):
        t0 = time.perf_counter()
        _sync(f(ep, img_dev))
        t_1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [f(ep, img_dev) for _ in range(k)]
        _sync(outs[-1])
        t_k = time.perf_counter() - t0
        per = (t_k - t_1) / (k - 1)
        print(
            f"rep{rep}: single-dispatch T1={t_1 * 1e3:7.1f} ms"
            f"  T{k}={t_k * 1e3:7.1f} ms"
            f"  -> pipelined device/encode = {per * 1e3:6.1f} ms",
            flush=True,
        )


def mode_blocks():
    import jax
    import jax.numpy as jnp

    from super_primitive_tpu.nets.sam.image_encoder import (
        VIT_H,
        Block,
        window_partition,
    )

    cfg = dataclasses.replace(
        VIT_H, global_attn_impl="ext", windowed_attn_impl="ext",
        persistent_windows=True, gelu_approx=True,
    )
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    NW, ws = 25, 14
    xw0 = jax.random.normal(rng, (NW, ws, ws, 1280), dt)
    pad_mask, _ = window_partition(jnp.ones((1, 64, 64, 1), dt), ws)
    xg0 = jax.random.normal(rng, (1, 64, 64, 1280), dt)

    def timed(mk_block, x0, extra, label, k1=7, k2=21, reps=5):
        blk = mk_block()
        params = blk.init(jax.random.PRNGKey(1), x0, *extra)["params"]
        params = jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params
        )

        def chain(kk):
            def f(x):
                def body(i, h):
                    out = blk.apply({"params": params}, h, *extra)
                    return h + (out - h) * 0.03  # damp; keeps real dataflow

                return jax.lax.fori_loop(0, kk, body, x).astype(jnp.float32).sum()

            return jax.jit(f)

        f1, f2 = chain(k1), chain(k2)
        t0 = time.perf_counter()
        _sync(f1(x0)); _sync(f2(x0))
        print(f"  [{label}: compile {time.perf_counter() - t0:.0f}s]", flush=True)
        t1, t2 = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); _sync(f1(x0)); t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); _sync(f2(x0)); t2.append(time.perf_counter() - t0)
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
        f"\nbudget: 28*W1 + 4*G1 = {(28 * w1 + 4 * g1) * 1e3:.1f} ms"
        f" (compare vs --mode encode; rest = embed/neck/boundary partitions)",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("encode", "blocks"), default="encode")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}", flush=True)
    if args.mode == "encode":
        mode_encode(k=args.k)
    else:
        mode_blocks()


if __name__ == "__main__":
    main()
