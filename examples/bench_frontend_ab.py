"""Interleaved A/B: eager vs deferred round-1 mask transfer (frontend KF).

The deferred path (predictor.DeferredMasks) overlaps the round-1 survivor
mask transfer with round-2's decode and feeds BiNI device-resident masks.
A lone 3-run median cannot detect a ~100 ms effect under the axon relay's
weather (round-3 driver recorded 1947 ms for code that measured ~1.0 s);
this script alternates the two paths in ONE process — A B A B A B A B —
so both arms sample the same weather, and reports per-arm medians.

The toggle uses the production gate directly: infer_masks takes the
deferred path iff select_round.dispatch is non-None, so arm A nulls it
and arm B restores it.  Same models, same rng, same image.

    python examples/bench_frontend_ab.py [--pairs 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.config import load_config
    from super_primitive_tpu.frontend.process_frame import build_frontend
    from super_primitive_tpu.nets.nnet import NNET
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder
    from super_primitive_tpu.utils.timing import StageTimer

    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = VIT_H
    S = cfg.img_size // cfg.patch_size
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    t0 = time.perf_counter()
    sam_tree = {
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
    print(f"init {time.perf_counter()-t0:.0f} s", flush=True)

    # identical config to bench.py's frontend metric (see caveats there)
    config = load_config({
        "frontend": {"downsample_pow": 1, "check_for_depth_disc": False},
        "sam_params": {"stability_threshold": 0.0, "filter_edge_points": False},
    })
    fe = build_frontend(config, sam_tree, nnet_tree)
    r = np.random.default_rng(0)
    image = r.integers(0, 255, (960, 1280, 3), np.uint8)
    K = np.array([[1000.0, 0, 640.0], [0, 1000.0, 480.0], [0, 0, 1.0]])

    sr = fe.mask_predict_fn.select_round
    dispatch_fn = sr.dispatch

    def set_arm(deferred: bool):
        sr.dispatch = dispatch_fn if deferred else None

    # warm both arms (compile)
    for d in (False, True):
        set_arm(d)
        t0 = time.perf_counter()
        fe.process_to_kf(image, K)
        print(f"warm deferred={d}: {time.perf_counter()-t0:.1f} s", flush=True)

    results = {False: [], True: []}
    stages = {False: [], True: []}
    for p in range(args.pairs):
        for d in (False, True):
            set_arm(d)
            fe.rng = np.random.default_rng(42)
            fe.timer = StageTimer()
            img_run = image.copy()  # force set_image re-encode
            t0 = time.perf_counter()
            fe.process_to_kf(img_run, K)
            wall = 1000 * (time.perf_counter() - t0)
            results[d].append(wall)
            stages[d].append({k: round(1000 * v, 1) for k, v in fe.timer.last.items()})
            print(f"pair {p} deferred={d}: {wall:.0f} ms", flush=True)

    for d in (False, True):
        w = sorted(results[d])
        med = w[len(w) // 2]
        name = "deferred" if d else "eager   "
        print(f"{name}: median {med:.0f} ms  runs {[round(x) for x in results[d]]}",
              flush=True)
        i = results[d].index(w[len(w) // 2])
        print(f"  stages@median: {stages[d][i]}", flush=True)


if __name__ == "__main__":
    main()
