"""Wall anatomy of the frontend's round-1 dispatch chain.

profile_select_pipelined closed the device budget: NNET 47 + encoder 71 +
decode_select 48 + NMS 3 = ~170 ms, but the frontend's round-1
select_finish blocks ~360 ms.  This probe replays the EXACT round-1
sequence (warm) in two modes:

  A. pipelined   — enqueue NNET, preload, set_image, select_dispatch(+NMS),
                   then ONE sync: wall = chain device + unoverlapped relay
                   constants.
  B. stage-sync  — sync after every stage: upper bound, shows each stage's
                   standalone wall (device + its own constants).

A - 170 = the relay constants that do NOT hide behind device execution
(argument uploads, per-executable dispatch costs).  Run alone on the chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import cv2
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.nets.nnet import NNET, predict_normals
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.predictor import SamPredictor
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = VIT_H
    S = cfg.img_size // cfg.patch_size
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
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
    nnet_tree = jax.jit(NNET().init)(k4, jnp.zeros((1, 480, 640, 3)))
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
    pred = SamPredictor(params, cfg, compute_dtype=jnp.bfloat16)

    r = np.random.default_rng(0)
    image = r.integers(0, 255, (960, 1280, 3), np.uint8)
    img01 = image.astype(np.float32) / 255.0
    pts = (r.random((300, 2)) * np.asarray([1024.0, 768.0])).round()

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        return float(np.asarray(leaf[(0,) * leaf.ndim]))

    def chain(mode):
        marks = [("start", time.perf_counter())]
        nd, _ = predict_normals(
            nnet_tree, jnp.asarray(image), (480, 640), coarse_hw=(240, 320)
        )
        marks.append(("nnet_dispatch", time.perf_counter()))
        if mode == "B":
            sync(nd)
            marks.append(("nnet_SYNC", time.perf_counter()))
        pred.preload_image(image)
        marks.append(("preload", time.perf_counter()))
        pred.set_image(image)
        marks.append(("set_image", time.perf_counter()))
        if mode == "B":
            sync(pred._features)
            marks.append(("encode_SYNC", time.perf_counter()))
        h = pred.select_dispatch(
            pts, iou_threshold=0.0, stability_threshold=0.90, out_size=256,
            nms_enabled=True, box_nms_thresh=0.8, filter_by_box_size=True,
        )
        marks.append(("select_dispatch", time.perf_counter()))
        sel = pred.select_finish(
            h, nms_enabled=True, box_nms_thresh=0.8, filter_by_box_size=True,
            defer_masks=True,
        )
        marks.append(("select_finish", time.perf_counter()))
        sync(nd)
        marks.append(("normals_SYNC", time.perf_counter()))
        # reset predictor image cache so the next run re-encodes
        pred._last_image = None
        pred._features = None
        return marks, sel

    for mode in ("A", "B", "A", "B", "A"):
        # fresh array object each run (same bytes) so identity caches miss
        image = image.copy()
        img01 = image.astype(np.float32) / 255.0
        marks, sel = chain(mode)
        t0 = marks[0][1]
        parts = "  ".join(
            f"{name}+{(t - tp) * 1e3:.0f}"
            for (name, t), (_, tp) in zip(marks[1:], marks[:-1])
        )
        print(
            f"mode {mode}: total {(marks[-1][1] - t0) * 1e3:6.0f} ms   {parts}"
            f"   (survivors {sel['keypoints_ids'].size})",
            flush=True,
        )


if __name__ == "__main__":
    main()
