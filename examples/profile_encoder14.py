"""True full-encoder DEVICE time via pipelined dispatches — no new jit.

profile_encoder11 bounded the block budget at 28*W1 + 4*G1 = 67.1 ms, vs a
"shipped ~97.7 ms" that came from warm set_image wall minus one trivial-RTT
(bench_frontend.py:104-110).  That subtraction still bills the encoder for
the image upload and any relay constants that do NOT pipeline.  A k-repeat
in-dispatch scan of the full ViT-H would be exact but its fresh jit never
compiles through the relay (profile_encoder8/12 failure mode).

This probe needs NO new compilation: it reuses the production
``SamPredictor._encode_u8`` jit (persistent-cache hit), pre-uploads the
uint8 image ONCE, then enqueues k back-to-back async dispatches and syncs
only the last result.  Device executes dispatches in order, so

    device_ms_per_encode = (T_k - T_1) / (k - 1)

cancels every per-call constant that overlaps with device execution and the
one-time sync tail.  If dispatches fail to pipeline (client blocks per
call), the number degenerates to RTT+device and the probe reports both runs
so that is visible.

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

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.predictor import SamPredictor
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = VIT_H
    S = cfg.img_size // cfg.patch_size
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
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
        "prompt_encoder": pe.init(k2, jnp.zeros((1, 2, 2)), jnp.zeros((1, 2)))["params"],
        "mask_decoder": dec.init(
            k3, jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((2, 2, cfg.out_chans)),
            jnp.zeros((2, S, S, cfg.out_chans)),
        )["params"],
    }
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
    pred = SamPredictor(params, cfg, compute_dtype=jnp.bfloat16)

    from super_primitive_tpu.nets.sam.predictor import get_preprocess_shape

    r = np.random.default_rng(0)
    h2, w2 = get_preprocess_shape(960, 1280, cfg.img_size)
    img_dev = jax.device_put(r.integers(0, 255, (h2, w2, 3), np.uint8))

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    f = pred._encode_u8
    ep = pred._enc_params
    t0 = time.perf_counter()
    sync(f(ep, img_dev))
    print(f"warm/compile: {time.perf_counter()-t0:.1f}s", flush=True)

    K = 8
    for rep in range(4):
        t0 = time.perf_counter()
        out1 = f(ep, img_dev)
        sync(out1)
        t_1 = time.perf_counter() - t0

        t0 = time.perf_counter()
        outs = [f(ep, img_dev) for _ in range(K)]
        sync(outs[-1])
        t_k = time.perf_counter() - t0
        per = (t_k - t_1) / (K - 1)
        print(
            f"rep{rep}: T1={t_1*1e3:7.1f} ms  T{K}={t_k*1e3:7.1f} ms"
            f"  -> device/encode = {per*1e3:6.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
