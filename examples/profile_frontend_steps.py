"""Fine-grained wall split of the frontend keyframe's SAM stages.

BENCH r4: frontend 914 ms = sam_round1 516 + sam_round2 124 + edges 41 +
bini 161 + misc.  Known device costs: encoder ~98 ms (but see
profile_encoder.py --mode encode — true pipelined number may be lower), select decode ~160
device.  So sam_round1 carries ~200+ ms of host glue / RTTs this probe
localizes by timing each call INSIDE the round:

  set_image            (encoder dispatch enqueue; should not block)
  select_dispatch      (decode enqueue)
  select_finish        (BLOCKS on encoder+decode+scalar fetch)
  coverage             (BLOCKS on the OR-plane gather)
  dispatch_integration (BiNI enqueue incl. host routing work)
  deferred.fetch       (round-1 survivor transfer, ridden under round 2)
  active_sample_pos / nms / host numpy work

Same setup as bench.py's bench_frontend_keyframe (random weights, disc
split off).  Run alone on the chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

LOG = []


def wrap(obj, name, label=None):
    fn = getattr(obj, name)
    lab = label or name

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        LOG.append((lab, time.perf_counter() - t0))
        return out

    setattr(obj, name, timed)
    return fn


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from super_primitive_tpu.config import load_config
    from super_primitive_tpu.frontend import process_frame as pf
    from super_primitive_tpu.frontend.process_frame import build_frontend
    from super_primitive_tpu.nets.nnet import NNET
    from super_primitive_tpu.nets.sam import predictor as pred_mod
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

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
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    config = load_config({
        "frontend": {"downsample_pow": 1, "check_for_depth_disc": False},
        "sam_params": {"stability_threshold": 0.0, "filter_edge_points": False},
    })
    fe = build_frontend(config, sam_tree, nnet_tree)

    # --- instrument ---------------------------------------------------
    # the predictor is closure-captured; reach it via the preload bound method
    predictor = fe.mask_predict_fn.preload.__self__
    wrap(predictor, "set_image")
    wrap(predictor, "select_dispatch")
    wrap(predictor, "select_finish")
    wrap(pred_mod.DeferredMasks, "coverage")
    wrap(pred_mod.DeferredMasks, "fetch")
    wrap(pred_mod.DeferredMasks, "device_masks_resized")
    wrap(pred_mod.DeferredMasks, "resized_bbox_sizes")
    wrap(fe, "_dispatch_integration_deferred")
    wrap(fe, "_dispatch_integration")
    from super_primitive_tpu.frontend import mask_generation as mg

    wrap(mg, "active_sample_pos")
    wrap(mg, "nms")
    wrap(np, "unpackbits")

    r = np.random.default_rng(0)
    image = r.integers(0, 255, (960, 1280, 3), np.uint8)
    K = np.array([[1000.0, 0, 640.0], [0, 1000.0, 480.0], [0, 0, 1.0]])

    fe.process_to_kf(image, K)  # warm
    for run in range(3):
        LOG.clear()
        from super_primitive_tpu.utils.timing import StageTimer

        fe.timer = StageTimer()
        fe.rng = np.random.default_rng(42)
        img_run = image.copy()
        t0 = time.perf_counter()
        fe.process_to_kf(img_run, K)
        wall = time.perf_counter() - t0
        from collections import defaultdict

        agg = defaultdict(float)
        cnt = defaultdict(int)
        for lab, dt in LOG:
            agg[lab] += dt
            cnt[lab] += 1
        print(f"\n== run {run}: wall {wall*1e3:.0f} ms ==", flush=True)
        for lab, tot in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"  {lab:32s} {tot*1e3:7.1f} ms  x{cnt[lab]}", flush=True)
        acc = sum(agg.values())
        print(f"  {'(accounted)':32s} {acc*1e3:7.1f} ms", flush=True)
        if fe.timer is not None and getattr(fe.timer, "last", None):
            print("  stages:", {k: round(1000 * v, 1) for k, v in fe.timer.last.items()},
                  flush=True)


if __name__ == "__main__":
    main()
