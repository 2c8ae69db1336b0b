"""Select-round internal split: decoder vs phase-count stats vs packing.

The 300-prompt select round is ~244 ms wall; this probe times, at the
shipped chunk (320 padded prompts, bf16 decoder):

  0. trivial dispatch            (relay RTT floor)
  1. _decode alone               (two-way transformer + per-prompt upscale)
  2. phase-count stats alone     (_phase_upsample_counts on (960,256,256))
  3. _decode_select full         (decode + stats + pick + pack + boxes)

If (2) dominates, the 16-phase elementwise loop is the target: its HBM
traffic is ~25 GB by construction (every phase re-reads the full lowres
grid several times); a fused (Pallas) one-pass kernel reads it once.
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
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.predictor import (
        SamPredictor, _phase_upsample_counts,
    )
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    def wall(fn, *a, reps=5, label=""):
        fn(*a)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{label:54s} {1000 * min(ts):8.1f} ms wall", flush=True)
        return 1000 * min(ts)

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

    CH = 320
    pts = jnp.asarray((r.random((CH, 2)) * np.asarray([1024.0, 768.0])).round())[
        :, None, :
    ]
    pts = jnp.concatenate([pts, jnp.zeros_like(pts)], axis=1)
    labels = jnp.concatenate([jnp.ones((CH, 1)), -jnp.ones((CH, 1))], axis=1)
    input_hw = jnp.asarray(pred._input_hw)

    triv = jax.jit(lambda: jnp.zeros(()) + 1.0)
    wall(triv, label="0. trivial dispatch")

    dec = jax.jit(
        lambda: pred._decode(pred.params, pred._features, pts, labels)[0].sum()
    )
    wall(dec, label="1. _decode only (320 prompts, bf16)")

    lowres = pred._decode(pred.params, pred._features, pts, labels)[0][:, 1:]
    x = lowres.reshape(CH * 3, lowres.shape[-1], lowres.shape[-1])
    s = cfg.img_size // lowres.shape[-1]
    stats = jax.jit(
        lambda x_: jax.tree.map(
            jnp.sum, _phase_upsample_counts(x_, s, input_hw)
        )
    )
    wall(stats, x, label=f"2. phase-count stats alone ({CH * 3}x{x.shape[-1]}^2, s={s})")

    from super_primitive_tpu.ops.pallas_phase_counts import phase_counts_pallas

    pstats = jax.jit(
        lambda x_: jax.tree.map(
            jnp.sum, phase_counts_pallas(x_, s, input_hw)
        )
    )
    wall(pstats, x, label="2b. phase-count stats, fused Pallas kernel")

    sel = jax.jit(
        lambda: pred._decode_select(
            pred.params, pred._features, pts, labels, input_hw, 256,
            jnp.asarray(0.0), jnp.asarray(0.0),
        )[0].sum()
    )
    wall(sel, label="3. _decode_select full dispatch")


if __name__ == "__main__":
    main()
