"""300-prompt select-round wall time (VERDICT r2 #2: target <= 0.4 s on the
relay; formerly 0.8-1.6 s via ship-everything).  Times
predict_points_select (device selection + survivor-only transfer) vs the
old predict_points_with_stats path on the same ViT-H predictor."""

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
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.predictor import SamPredictor
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    cfg = VIT_H
    S = cfg.img_size // cfg.patch_size
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
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
    pred = SamPredictor(params, cfg, compute_dtype=jnp.bfloat16)
    r = np.random.default_rng(0)
    image = r.integers(0, 255, (960, 1280, 3), np.uint8)
    pred.set_image(image)
    pts = (r.random((300, 2)) * np.asarray([1024.0, 768.0])).round()

    out = pred.predict_points_select(pts, stability_threshold=0.0)
    print(f"select kept {out['masks'].shape[0]} / 300", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = pred.predict_points_select(pts, stability_threshold=0.0)
        times.append(time.perf_counter() - t0)
    print(f"select_round 300 prompts: {1000 * min(times):.0f} ms wall "
          f"({out['masks'].shape[0]} survivors shipped)", flush=True)

    pred.predict_points_with_stats(pts, out_size=256)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pred.predict_points_with_stats(pts, out_size=256)
        times.append(time.perf_counter() - t0)
    print(f"stats path (ship all 900 masks): {1000 * min(times):.0f} ms wall",
          flush=True)


if __name__ == "__main__":
    main()
