"""True device time of the 320-prompt _decode_select via pipelined dispatches.

Companion to profile_encoder.py --mode encode (same methodology: k back-to-back async
dispatches of the ALREADY-COMPILED production jit, sync once, difference).
Closes the select-round budget: probe_select_round2 measured ~193 ms wall
for the full select round, the phase-stats commit claimed ~60 ms device for
the decode — but the frontend's round-1 select_finish blocks ~350 ms, which
NNET(47) + encoder(71) + decode(60) + RTT does not explain.  Also times the
chained device-NMS dispatch and the 128-prompt round-2 shape.

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
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    t0 = time.perf_counter()
    params = {
        "image_encoder": jax.jit(ImageEncoderViT(cfg).init)(
            k1, jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        )["params"],
        "prompt_encoder": PromptEncoder(
            embed_dim=cfg.out_chans, image_embedding_size=(S, S),
            input_image_size=(cfg.img_size, cfg.img_size),
        ).init(k2, jnp.zeros((1, 2, 2)), jnp.zeros((1, 2)))["params"],
        "mask_decoder": MaskDecoder(transformer_dim=cfg.out_chans).init(
            k3, jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((1, S, S, cfg.out_chans)),
            jnp.zeros((2, 2, cfg.out_chans)),
            jnp.zeros((2, S, S, cfg.out_chans)),
        )["params"],
    }
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
    pred = SamPredictor(params, cfg, compute_dtype=jnp.bfloat16)
    r = np.random.default_rng(0)
    image = r.integers(0, 255, (960, 1280, 3), np.uint8)
    pred.set_image(image)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    def pipelined(label, call, K=8, reps=3):
        sync(call())  # warm / compile
        for rep in range(reps):
            t0 = time.perf_counter()
            sync(call())
            t_1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [call() for _ in range(K)]
            sync(outs[-1])
            t_k = time.perf_counter() - t0
            per = (t_k - t_1) / (K - 1)
            print(
                f"{label:34s} rep{rep}: T1={t_1*1e3:7.1f}  T{K}={t_k*1e3:7.1f}"
                f"  -> device = {per*1e3:6.1f} ms",
                flush=True,
            )

    for nprompts in (300, 100):
        chunk = max(64, -(-nprompts // 64) * 64)
        pts = (r.random((nprompts, 2)) * np.asarray([1024.0, 768.0])).round()

        def dispatch_only():
            h = pred.select_dispatch(
                pts, iou_threshold=0.0, stability_threshold=0.90,
                out_size=256,
            )
            return h["pending"][0][2]

        def dispatch_nms():
            h = pred.select_dispatch(
                pts, iou_threshold=0.0, stability_threshold=0.90,
                out_size=256, nms_enabled=True, box_nms_thresh=0.8,
                filter_by_box_size=True,
            )
            return h["nms"]

        pipelined(f"decode_select[{chunk}]", dispatch_only)
        pipelined(f"decode_select+NMS[{chunk}]", dispatch_nms)


if __name__ == "__main__":
    main()
