"""VOID depth-completion dataset (reference: evaluate_void.py:87-116).

Layout: <root>/test_image.txt lists image paths; sparse_depth / validity_map /
ground_truth are sibling dirs, depths at 1/256 scale; K.txt two dirs up from
each image.
"""

from __future__ import annotations

import os
from pathlib import Path

import cv2
import numpy as np

MIN_DEPTH, MAX_DEPTH = 0.2, 5.0  # evaluate_void.py:66


class VoidDataset:
    def __init__(self, root_dir: str, split_file: str = "test_image.txt"):
        self.root = Path(root_dir)
        with open(self.root / split_file) as f:
            self.image_files = [line.rstrip() for line in f]

    def __len__(self):
        return len(self.image_files)

    def __getitem__(self, idx):
        image_fp = str(self.root / self.image_files[idx])
        image = cv2.imread(image_fp)
        if image.ndim == 2:
            image = cv2.cvtColor(image, cv2.COLOR_GRAY2BGR)
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

        K = np.loadtxt(Path(image_fp).parent.parent / "K.txt")

        def load_png16(fp, scale):
            d = cv2.imread(fp, -1).astype(np.float32) * scale
            d[d <= 0] = 0.0
            return d

        sparse = load_png16(image_fp.replace("image", "sparse_depth"), 1.0 / 256.0)
        validity = cv2.imread(image_fp.replace("image", "validity_map"), -1).astype(np.float32)
        validity[validity > 0] = 1.0
        gt = load_png16(image_fp.replace("image", "ground_truth"), 1.0 / 256.0)

        # GT valid range mask; invalid -> inf (evaluate_void.py:113-116)
        mask = (gt < MAX_DEPTH) & (gt > MIN_DEPTH)
        gt = gt.copy()
        gt[~mask] = np.inf

        return {
            "image": image,
            "sparse_depth": sparse,
            "validity_map": validity,
            "gt_depth": gt,
            "gt_valid": mask,
            "intrinsics": K,
        }
