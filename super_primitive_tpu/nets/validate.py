"""Checkpoint-conversion validation (VERDICT r1 #6b — day-0 readiness).

Given real reference checkpoints, one command compares the converted Flax
frontends against the torch originals on one image, layer by layer where
both sides are available:

    python convert_checkpoints.py --sam sam_vit_h_4b8939.pth --validate
    python convert_checkpoints.py --nnet scannet.pth --validate

Two tiers, degrading gracefully with what's installed:

  1. Flax-side validation (always runs): the converted tree is applied on a
     test image through the full predictor; per-stage activation statistics
     (mean/std/finite) are printed so a transposed conv or BN-stats mistake
     shows up as an implausible distribution rather than a silent wrong mask.
  2. Torch cross-check (runs when ``segment_anything`` / ``geffnet`` are
     importable, as in the reference's conda env — install.sh:4-19): the
     torch model runs the same image; embeddings, per-block outputs, mask
     logits / normals are diffed numerically (reference behavior:
     frontend/segment/sam_tools.py:8-45, frontend/normals/normals_inferer.py).
"""

from __future__ import annotations

import numpy as np


def _stat(name: str, x) -> str:
    x = np.asarray(x)
    finite = np.isfinite(x).all()
    return (
        f"  {name:<38s} shape={tuple(x.shape)!s:<22s} "
        f"mean={x.mean():+.4f} std={x.std():.4f} "
        f"absmax={np.abs(x).max():.4f} finite={bool(finite)}"
    )


def _test_image(hw=(480, 640)) -> np.ndarray:
    """Deterministic structured test image (blobs + gradient, not noise)."""
    H, W = hw
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(u * 0.05) * np.cos(v * 0.04),
            0.5 + 0.4 * np.cos(u * 0.03 + v * 0.02),
            np.clip((u + v) / (H + W), 0, 1),
        ],
        -1,
    )
    return (img * 255).astype(np.uint8)


def _grid_points(hw, n=3):
    H, W = hw
    ys = np.linspace(0.2, 0.8, n) * H
    xs = np.linspace(0.2, 0.8, n) * W
    return np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)


# --------------------------------------------------------------------- SAM
def validate_sam(tree: dict, ckpt_path: str | None = None,
                 image: np.ndarray | None = None, cfg=None) -> dict:
    """Run the converted Flax SAM; cross-check vs torch when available.

    Returns a dict of comparison metrics (empty Flax-only entries when the
    torch side is unavailable)."""
    import jax

    from .sam.image_encoder import VIT_H
    from .sam.predictor import SamPredictor

    cfg = cfg or VIT_H
    image = image if image is not None else _test_image()
    pts = _grid_points(image.shape[:2])

    predictor = SamPredictor(jax.tree.map(np.asarray, tree), cfg)
    predictor.set_image(image)
    feats = np.asarray(predictor._features)
    print("[flax] SAM forward:")
    print(_stat("image_embedding", feats))
    logits, iou = predictor.predict_batched_points(pts)
    logits, iou = np.asarray(logits), np.asarray(iou)
    print(_stat("mask_logits", logits))
    print(_stat("iou_pred", iou))
    areas = (logits > 0).mean(axis=(-2, -1))
    print(f"  mask area fractions per prompt (3 scales): {np.round(areas, 3)}")
    result = {
        "flax_embed_std": float(feats.std()),
        "flax_iou": iou.tolist(),
    }

    try:
        import torch
        from segment_anything import SamPredictor as TorchPredictor
        from segment_anything import sam_model_registry
    except ImportError as e:
        print(f"[torch] cross-check skipped ({e}); Flax-only validation done")
        return result

    assert ckpt_path, "--validate cross-check needs the original .pth path"
    sam = sam_model_registry["vit_h"](checkpoint=ckpt_path).eval()
    tp = TorchPredictor(sam)

    # per-block encoder taps
    taps = {}

    def hook(name):
        def f(_m, _i, o):
            taps[name] = o.detach().cpu().numpy()
        return f

    hooks = [
        sam.image_encoder.blocks[i].register_forward_hook(hook(f"block_{i}"))
        for i in (0, len(sam.image_encoder.blocks) // 2,
                  len(sam.image_encoder.blocks) - 1)
    ]
    with torch.no_grad():
        tp.set_image(image)
    for h in hooks:
        h.remove()
    t_feats = tp.features.cpu().numpy()[0]          # (C, S, S)

    # Flax per-block taps via capture_intermediates on the encoder
    from .sam.image_encoder import ImageEncoderViT

    enc = ImageEncoderViT(cfg)
    x = predictor._preprocessed  # set_image stores the padded/normalized input
    _, inter = enc.apply(
        {"params": jax.tree.map(np.asarray, tree["image_encoder"])}, x,
        capture_intermediates=True, mutable=["intermediates"],
    )
    blocks = inter["intermediates"]

    print("[torch] cross-check:")
    f_embed = np.moveaxis(feats[0], -1, 0) if feats.ndim == 4 else feats
    emb_err = np.abs(f_embed - t_feats).max()
    print(f"  image_embedding max abs diff: {emb_err:.3e}")
    result["embed_max_abs_diff"] = float(emb_err)
    for name, t_out in sorted(taps.items()):
        key = name.replace("block_", "")
        fl = blocks.get(f"block{key}", None)
        if fl is not None:
            f_out = np.asarray(jax.tree.leaves(fl)[0])
            err = np.abs(f_out - t_out).max()
            print(f"  {name} max abs diff: {err:.3e}")
            result[f"{name}_max_abs_diff"] = float(err)

    with torch.no_grad():
        pt = torch.as_tensor(
            tp.transform.apply_coords(pts[:, None, :], image.shape[:2]),
            device=sam.device, dtype=torch.float32,
        )
        lbl = torch.ones(pt.shape[:2], device=sam.device)
        t_masks, t_iou, _ = tp.predict_torch(pt, lbl, multimask_output=True)
    t_masks = t_masks.cpu().numpy()
    t_iou = t_iou.cpu().numpy()
    m_f = logits > 0
    inter_ = (m_f & t_masks).sum(axis=(-2, -1))
    union = np.maximum((m_f | t_masks).sum(axis=(-2, -1)), 1)
    mask_iou = inter_ / union
    print(f"  per-prompt mask IoU (flax vs torch): min={mask_iou.min():.4f} "
          f"mean={mask_iou.mean():.4f}")
    print(f"  iou_pred max abs diff: {np.abs(iou - t_iou).max():.3e}")
    result["mask_iou_min"] = float(mask_iou.min())
    result["iou_pred_max_abs_diff"] = float(np.abs(iou - t_iou).max())
    return result


# -------------------------------------------------------------------- NNET
def validate_nnet(params: dict, ckpt_path: str | None = None,
                  image: np.ndarray | None = None,
                  network_dim=(480, 640)) -> dict:
    """Run the converted Flax NNET; cross-check vs torch+geffnet when
    available."""
    import jax
    import jax.numpy as jnp

    from .nnet import predict_normals

    image = image if image is not None else _test_image()
    img01 = image.astype(np.float32) / 255.0
    normals, kappa = predict_normals(
        jax.tree.map(np.asarray, params), jnp.asarray(img01), tuple(network_dim)
    )
    normals, kappa = np.asarray(normals), np.asarray(kappa)
    print("[flax] NNET forward:")
    print(_stat("normals", normals))
    print(_stat("kappa", kappa))
    norm_len = np.linalg.norm(normals, axis=-1)
    print(f"  |n| range: [{norm_len.min():.4f}, {norm_len.max():.4f}] (should be ~1)")
    result = {"flax_norm_len_mean": float(norm_len.mean())}

    try:
        import torch  # noqa: F401
        import geffnet  # noqa: F401
    except ImportError as e:
        print(f"[torch] cross-check skipped ({e}); Flax-only validation done")
        return result

    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from frontend.normals.scannet_model import NNET as TorchNNET
    except ImportError as e:
        print(f"[torch] reference NNET import failed ({e})")
        return result
    import torch

    model = TorchNNET({"architecture": "BN"}).eval()
    sd = torch.load(ckpt_path, map_location="cpu")
    model.load_state_dict(
        {k.replace("module.", ""): v for k, v in sd["model"].items()}
        if "model" in sd else sd
    )
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.as_tensor(img01).permute(2, 0, 1)[None]
    x = torch.nn.functional.interpolate(
        x, size=tuple(network_dim), mode="bilinear", align_corners=True
    )
    with torch.no_grad():
        out = model((x - mean) / std)[-1][-1]
    out = torch.nn.functional.interpolate(
        out, size=img01.shape[:2], mode="bilinear", align_corners=True
    )[0].permute(1, 2, 0).numpy()
    n_err = np.abs(out[..., :3] - normals).max()
    k_err = np.abs(out[..., 3:] - kappa).max()
    print(f"[torch] normals max abs diff: {n_err:.3e}; kappa: {k_err:.3e}")
    result["normals_max_abs_diff"] = float(n_err)
    result["kappa_max_abs_diff"] = float(k_err)
    return result
