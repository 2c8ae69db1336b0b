"""CLI-level end-to-end for the VOID depth-completion workload:
evaluate_void.py over an on-disk VOID-format tree (test_image.txt list,
sparse_depth / validity_map / ground_truth siblings at 1/256 scale, K.txt
two dirs up — data/void.py layout, reference evaluate_void.py:87-116),
subprocess, GT-patch stub frontend."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def void_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("void_tree")
    seq = root / "void_150" / "data" / "seq0"
    for sub in ("image", "sparse_depth", "validity_map", "ground_truth"):
        (seq / sub).mkdir(parents=True)
    H, W, n_sparse = 48, 64, 40
    r = np.random.default_rng(0)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    entries = []
    for i in range(2):
        gt = (1.5 + 0.3 * np.sin(u * 0.1 + i) + 0.2 * np.cos(v * 0.13)).astype(
            np.float32
        )
        sparse = np.zeros((H, W), np.float32)
        idx = r.choice(H * W, n_sparse, replace=False)
        sparse.reshape(-1)[idx] = gt.reshape(-1)[idx]
        img = (np.clip(gt / 3.0, 0, 1)[..., None] * [255, 200, 150]).astype(np.uint8)
        name = f"{i:04d}.png"
        cv2.imwrite(str(seq / "image" / name), img)
        cv2.imwrite(
            str(seq / "sparse_depth" / name),
            np.round(sparse * 256).astype(np.uint16),
        )
        cv2.imwrite(
            str(seq / "validity_map" / name),
            (sparse > 0).astype(np.uint16),
        )
        cv2.imwrite(
            str(seq / "ground_truth" / name),
            np.round(gt * 256).astype(np.uint16),
        )
        entries.append(f"void_150/data/seq0/image/{name}")
    np.savetxt(
        seq / "K.txt",
        np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1.0]]),
    )
    (root / "test_image.txt").write_text("\n".join(entries))
    return root


def test_evaluate_void_cli(void_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "evaluate_void.py"),
            "--dataset", str(void_dir), "--stub-frontend", "--max-images", "2",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "=== filled over 2 samples ===" in out, out[-2000:]
    assert "=== valid-only over 2 samples ===" in out

    # GT-patch segments (quantized to 1/256 m): the valid-only track must be
    # near-exact; parse the rmse row of that table (mm units)
    valid_block = out.split("=== valid-only")[1]
    rmse_mm = float(
        [l for l in valid_block.splitlines() if "rmse" in l and "inv" not in l][0]
        .split(":")[1]
    )
    assert rmse_mm < 20.0, out[-2000:]
    assert "validity rate:" in out
