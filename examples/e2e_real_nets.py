#!/usr/bin/env python
"""REAL Flax nets inside the odometry loop (VERDICT r4 missing #2 / next #3).

Drives the production Odometry loop over a synthetic sequence with the REAL
ViT-H SAM + EfficientNet-B5 NNET frontend — the exact configuration real
TUM data will exercise (reference odometery.py:166 calling process_to_kf
every keyframe) and the one that had never executed end-to-end before this
probe: full-size encoder weights resident in HBM alongside the window
buffers, encode/decode dispatches interleaved with tracking and mapping.

Random weights produce speckle masks, so (like bench.py's frontend leg) the
stability filter runs at 0 and edge-point filtering is off — mask CONTENT is
meaningless here; what's measured is the integration: per-KF frontend wall
inside the loop (``frontend_in_loop_ms``), per-frame tracking wall with the
encoder resident, memory behavior, recompile churn.

    python examples/e2e_real_nets.py [--frames 12] [--solver adam|gn]
    python examples/e2e_real_nets.py --sam-npz ... --nnet-npz ...  # day0 trees

Weights: --sam-npz/--nnet-npz load converted day-0 artifact trees
(convert_checkpoints.py output); default initializes random full-size params
directly (identical compute/memory).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def load_or_init_params(args, jax, jnp):
    from super_primitive_tpu.nets.nnet import NNET
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, ImageEncoderViT
    from super_primitive_tpu.nets.sam.mask_decoder import MaskDecoder
    from super_primitive_tpu.nets.sam.prompt_encoder import PromptEncoder

    if args.sam_npz and args.nnet_npz:
        # convert_checkpoints.py output format (day0_rehearsal.py:113)
        sam_tree = np.load(args.sam_npz, allow_pickle=True)["tree"].item()
        nnet_tree = np.load(args.nnet_npz, allow_pickle=True)["tree"].item()
        return sam_tree, nnet_tree

    cfg = VIT_H
    S = cfg.img_size // cfg.patch_size
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
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
    return sam_tree, nnet_tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--solver", choices=("gn", "adam"), default="gn")
    ap.add_argument("--sam-npz", default=None)
    ap.add_argument("--nnet-npz", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from super_primitive_tpu.data.synthetic import PlanesSequence
    from super_primitive_tpu.eval.e2e_synthetic import make_e2e_config
    from super_primitive_tpu.frontend.process_frame import build_frontend
    from super_primitive_tpu.odometry.odometry import Odometry

    print(f"[realnets] backend: {jax.default_backend()}")
    t0 = time.perf_counter()
    sam_tree, nnet_tree = load_or_init_params(args, jax, jnp)
    print(f"[realnets] params ready in {time.perf_counter()-t0:.1f}s "
          f"({'converted npz' if args.sam_npz else 'random full-size init'})")

    cfg = make_e2e_config(args.solver)
    # real-net deviations from the fake-frontend e2e config: reference SAM
    # scale (odom_desk.yaml infer 960x1280, network_dim 480x640) and the
    # random-weight filter settings of bench.py's frontend leg (speckle
    # masks die at the default stability threshold; content is meaningless
    # here, the integration is what's under test)
    cfg = dataclasses.replace(
        cfg,
        frontend=dataclasses.replace(cfg.frontend, check_for_depth_disc=False),
        sam_params=dataclasses.replace(
            cfg.sam_params, infer_resolution=(960, 1280),
            stability_threshold=0.0, filter_edge_points=False,
        ),
    )
    ds = PlanesSequence(n_frames=args.frames, H=480, W=640, path="linear")
    fe = build_frontend(cfg, sam_tree, nnet_tree)
    odom = Odometry(cfg, fe, ds)

    t0 = time.perf_counter()
    odom.run()
    wall = time.perf_counter() - t0

    kf_walls = [w for _, w, _ in odom.kf_add_log]
    warm = kf_walls[2:] or kf_walls
    t = odom.timer
    n_track = max(t.counts.get("track", 0) + t.counts.get("fused_frame", 0), 1)
    track_s = t.totals.get("track", 0.0) + t.totals.get("fused_frame", 0.0)
    fel = 1000 * float(np.median(warm))
    print("\n[timing]\n" + t.report())
    print(f"\n[realnets] {len(ds)} frames, {len(kf_walls)} keyframes, "
          f"{wall:.1f}s wall")
    print(f"[realnets] frontend_in_loop_ms (warm median KF add): {fel:.0f}")
    print(f"[realnets] kf adds (s): "
          + ", ".join(f"{w:.2f}" for w in kf_walls))
    print(f"[realnets] track {1000 * track_s / n_track:.0f} ms/frame over "
          f"{n_track} frames; effective {max(len(ds)-1,1)/wall:.2f} FPS")
    print("[realnets] PASS (loop completed with the real nets resident)")


if __name__ == "__main__":
    main()
