#!/usr/bin/env python
"""Convert the reference's public torch checkpoints to Flax .npz trees.

python convert_checkpoints.py --sam sam_vit_h_4b8939.pth --out-sam sam.npz
python convert_checkpoints.py --nnet scannet.pth --out-nnet nnet.npz

Add ``--validate`` to run the converted Flax frontends on a test image
(``--image`` for your own) with per-stage activation statistics, and — when
the reference torch packages (segment_anything / geffnet) are installed — a
full layer-by-layer numerical diff against the torch originals
(nets/validate.py).

(The checkpoints themselves come from the reference's download.sh; torch is
only needed here, never at runtime.)
"""

import argparse

import numpy as np


def load_torch_state_dict(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if hasattr(ckpt, "state_dict"):
        ckpt = ckpt.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sam", default=None)
    ap.add_argument("--nnet", default=None)
    ap.add_argument("--out-sam", default="sam_vit_h.npz")
    ap.add_argument("--out-nnet", default="nnet_scannet.npz")
    ap.add_argument("--validate", action="store_true",
                    help="run the converted nets on a test image; diff vs "
                         "torch layer-by-layer when the reference packages "
                         "are installed")
    ap.add_argument("--image", default=None,
                    help="validation image path (default: synthetic)")
    ap.add_argument("--sam-cfg", default="vit_h", choices=("vit_h", "tiny"),
                    help="SAM encoder config; 'tiny' is for the offline "
                         "day-0 rehearsal (day0_rehearsal.py)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for validation forwards")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from super_primitive_tpu.nets import convert
    from super_primitive_tpu.nets.sam.image_encoder import VIT_H, VIT_TINY_TEST

    sam_cfg = VIT_H if args.sam_cfg == "vit_h" else VIT_TINY_TEST

    image = None
    if args.image:
        import cv2

        image = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)

    if args.sam:
        sd = load_torch_state_dict(args.sam)
        tree = convert.convert_sam(sd, depth=sam_cfg.depth)
        np.savez_compressed(args.out_sam, tree=np.asarray(tree, dtype=object))
        print(f"SAM -> {args.out_sam}")
        if args.validate:
            from super_primitive_tpu.nets.validate import validate_sam

            validate_sam(tree, ckpt_path=args.sam, image=image, cfg=sam_cfg)
    if args.nnet:
        sd = convert.strip_module_prefix(load_torch_state_dict(args.nnet))
        tree = convert.convert_nnet(sd)
        np.savez_compressed(args.out_nnet, tree=np.asarray(tree, dtype=object))
        print(f"NNET -> {args.out_nnet}")
        if args.validate:
            from super_primitive_tpu.nets.validate import validate_nnet

            validate_nnet(tree, ckpt_path=args.nnet, image=image)


if __name__ == "__main__":
    main()
