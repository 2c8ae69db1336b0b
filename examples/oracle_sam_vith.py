"""One-shot FULL ViT-H SAM architecture oracle vs transformers (CPU).

tests/test_hf_oracle.py proves the architecture at a scaled-down config;
this script runs the same shared-random-weights comparison at the real
ViT-H size (embed 1280, depth 32, heads 16, window 14, globals 7/15/23/31,
1024x1024 input) plus the full-size prompt encoder + mask decoder, through
the production converter and the shipped encoder lowering.  Run once, record
the max relative diffs in docs/EVAL_SYNTHETIC.md.

Takes several minutes on CPU (two ~0.6B-param forwards).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def max_rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from transformers import SamConfig, SamModel
    from super_primitive_tpu.nets import convert
    from super_primitive_tpu.nets.hf_oracle import (
        hf_sam_to_original,
        randomize_torch_state,
    )
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    torch.set_num_threads(os.cpu_count() or 8)

    from transformers.models.sam.configuration_sam import SamVisionConfig

    t0 = time.perf_counter()
    # explicit ViT-H (SamVisionConfig DEFAULTS are vit-base: 768/12)
    model = SamModel(
        SamConfig(
            vision_config=SamVisionConfig(
                hidden_size=1280, num_hidden_layers=32, num_attention_heads=16,
                global_attn_indexes=[7, 15, 23, 31],
            ),
            attn_implementation="eager",
        )
    )
    randomize_torch_state(model, seed=17)
    print(f"[{time.perf_counter() - t0:.0f}s] torch ViT-H built + randomized", flush=True)

    params = convert.convert_sam(hf_sam_to_original(model.state_dict()), depth=32)
    print(f"[{time.perf_counter() - t0:.0f}s] converted to Flax tree", flush=True)

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (1, 1024, 1024, 3)).astype(np.float32)

    with torch.no_grad():
        emb_t = model.vision_encoder(
            torch.tensor(img.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    print(f"[{time.perf_counter() - t0:.0f}s] torch encode done", flush=True)

    # shipped production lowering (persistent windows + extended-head relpos)
    import dataclasses

    cfg = dataclasses.replace(
        VIT_H, global_attn_impl="ext", windowed_attn_impl="ext",
        persistent_windows=True,
    )
    emb_j = ImageEncoderViT(cfg).apply(
        {"params": params["image_encoder"]}, jnp.asarray(img)
    )
    emb_j = np.asarray(emb_j)
    print(f"[{time.perf_counter() - t0:.0f}s] flax encode done", flush=True)
    d_enc = max_rel(np.moveaxis(emb_j, -1, 1), emb_t)
    print(f"ViT-H image encoder   max rel diff: {d_enc:.2e}")

    # prompt encoder + mask decoder at full size, on the torch embedding
    P = 8
    pts = rng.uniform(0, 1023, (P, 2)).astype(np.float32)
    with torch.no_grad():
        out = model(
            image_embeddings=torch.tensor(emb_t),
            input_points=torch.tensor(pts.reshape(1, P, 1, 2)),
            input_labels=torch.ones((1, P, 1), dtype=torch.long),
            multimask_output=True,
        )
    masks_t = out.pred_masks[0].numpy()
    iou_t = out.iou_scores[0].numpy()

    pe = PromptEncoder()
    pts_pad = np.stack([pts, np.zeros_like(pts)], axis=1)
    labels = np.tile(np.asarray([1, -1], np.int32), (P, 1))
    sparse, dense = pe.apply(
        {"params": params["prompt_encoder"]}, jnp.asarray(pts_pad), jnp.asarray(labels)
    )
    image_pe = pe.apply(
        {"params": params["prompt_encoder"]}, method=PromptEncoder.get_dense_pe
    )
    masks_j, iou_j = MaskDecoder().apply(
        {"params": params["mask_decoder"]},
        jnp.asarray(np.moveaxis(emb_t, 1, -1)), image_pe, sparse, dense,
    )
    d_masks = max_rel(np.asarray(masks_j)[:, 1:], masks_t)
    d_iou = max_rel(np.asarray(iou_j)[:, 1:], iou_t)
    print(f"mask decoder (lowres) max rel diff: {d_masks:.2e}")
    print(f"iou head              max rel diff: {d_iou:.2e}")
    print(f"[{time.perf_counter() - t0:.0f}s] done", flush=True)
    ok = d_enc < 1e-4 and d_masks < 1e-4 and d_iou < 1e-4
    print("ORACLE", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
