#!/usr/bin/env python
"""VOID depth-completion evaluation (reference: evaluate_void.py).

python evaluate_void.py --dataset /path/to/VOID --config config/... \
    [--sam-ckpt sam.npz --nnet-ckpt nnet.npz | --stub-frontend]

Prints the two reference metric tables (filled via griddata, and valid-only)
plus validity-rate statistics.
"""

import argparse
import copy
import os
import random

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--sam-ckpt", default=None)
    ap.add_argument("--nnet-ckpt", default=None)
    ap.add_argument("--stub-frontend", action="store_true")
    args = ap.parse_args()

    # reference seeds (evaluate_void.py:23-27)
    np.random.seed(144)
    random.seed(144)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_primitive_tpu.config import load_config
    from super_primitive_tpu.data.void import VoidDataset
    from super_primitive_tpu.depth_completion import metrics as M
    from super_primitive_tpu.depth_completion.completion import DepthCompletion
    from super_primitive_tpu.depth_completion.fill_in import fill_single_griddata

    config = load_config(args.config) if args.config else load_config({})
    ds = VoidDataset(args.dataset)

    if args.stub_frontend:
        # GT-depth patch segments around the sparse query points: drives
        # the entire completion pipeline (median alignment, overlap
        # averaging, loose-rerun fallback, both metric tracks) without the
        # nets — the CLI-level e2e for the VOID workload
        from super_primitive_tpu.frontend.stub import PatchSegmentFrontend

        frontend = PatchSegmentFrontend(patch=9)
    else:
        from super_primitive_tpu.frontend.process_frame import build_frontend

        sam_tree = np.load(args.sam_ckpt, allow_pickle=True)["tree"].item()
        nnet_tree = np.load(args.nnet_ckpt, allow_pickle=True)["tree"].item()
        frontend = build_frontend(config, sam_tree, nnet_tree)

    dc = DepthCompletion(frontend)
    avg_filled = M.ErrorMetricsAverager()
    avg_valid = M.ErrorMetricsAverager()
    validity_rates = []

    n = len(ds) if args.max_images is None else min(len(ds), args.max_images)
    for i in range(n):
        s = ds[i]
        observe = getattr(dc.frontend, "observe", None)
        if observe is not None:
            observe(s)
        depths, invalid = dc.depth_completion(
            s["image"], s["intrinsics"], s["sparse_depth"]
        )
        filled = fill_single_griddata(copy.copy(depths), invalid)

        mask = s["gt_valid"]
        m1 = M.ErrorMetrics()
        m1.compute(filled, s["gt_depth"], mask)
        avg_filled.accumulate(m1)

        mask_joint = np.logical_and(depths > 1e-6, mask)
        m2 = M.ErrorMetrics()
        m2.compute(depths, s["gt_depth"], mask_joint)
        avg_valid.accumulate(m2)

        validity_rates.append((depths > 1e-6).mean())
        print(f"[{i + 1}/{n}] validity rate {validity_rates[-1]:.3f}")

    for name, avg in (("filled", avg_filled), ("valid-only", avg_valid)):
        avg.average()
        print(f"\n=== {name} over {avg.total_count} samples ===")
        for k, v in avg.as_dict().items():
            print(f"  {k:>10}: {v:8.3f}")
    print(
        f"\nvalidity rate: mean {np.mean(validity_rates):.3f} "
        f"std {np.std(validity_rates):.3f} min {np.min(validity_rates):.3f} "
        f"median {np.median(validity_rates):.3f}"
    )


if __name__ == "__main__":
    main()
