"""Torch-checkpoint -> Flax parameter converters.

The reference ships two public checkpoints (download.sh:3-4):
``sam_vit_h_4b8939.pth`` (Segment Anything ViT-H) and ``scannet.pth``
(surface-normal NNET).  These converters map their state_dicts onto the
Flax module trees in nets/.  Conventions:

  - torch Linear weight (out, in) -> Dense kernel (in, out);
  - torch Conv2d weight (out, in, kh, kw) -> Conv kernel (kh, kw, in, out);
    depthwise: (ch, 1, kh, kw) -> (kh, kw, 1, ch);
  - torch ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out)
    with spatial flip (flax ConvTranspose uses cross-correlation of the
    gradient; torch's transposed conv equals flax with flipped kernels);
  - BatchNorm running stats -> batch_stats collection.

Loaders accept any mapping of name -> numpy array, so tests can feed
synthetic state dicts with the published naming scheme.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x)


def _dense(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T, "bias": _t(sd[f"{name}.bias"])}


def _dense_nobias(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T}


def _conv(sd, name, bias=True, depthwise=False):
    w = _t(sd[f"{name}.weight"])
    if depthwise:
        w = w.transpose(2, 3, 1, 0)  # (ch,1,kh,kw) -> (kh,kw,1,ch)
    else:
        w = w.transpose(2, 3, 1, 0)  # (out,in,kh,kw) -> (kh,kw,in,out)
    out = {"kernel": w}
    if bias:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _conv_transpose(sd, name):
    w = _t(sd[f"{name}.weight"])  # (in, out, kh, kw)
    w = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # (kh, kw, in, out), flipped
    return {"kernel": np.ascontiguousarray(w), "bias": _t(sd[f"{name}.bias"])}


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _ln2d(sd, name):
    return {"weight": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _bn(sd, name):
    return (
        {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])},
        {"mean": _t(sd[f"{name}.running_mean"]), "var": _t(sd[f"{name}.running_var"])},
    )


# --------------------------------------------------------------------- SAM
def convert_sam(sd: dict, depth: int = 32) -> dict:
    """Convert a SAM state_dict to the params tree consumed by
    :class:`nets.sam.predictor.SamPredictor` ({image_encoder, prompt_encoder,
    mask_decoder} sections)."""
    enc: dict = {}
    enc["patch_embed"] = _conv(sd, "image_encoder.patch_embed.proj")
    enc["pos_embed"] = _t(sd["image_encoder.pos_embed"])
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
                "rel_pos_h": _t(sd[f"{p}.attn.rel_pos_h"]),
                "rel_pos_w": _t(sd[f"{p}.attn.rel_pos_w"]),
            },
            "mlp_lin1": _dense(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _dense(sd, f"{p}.mlp.lin2"),
        }
    enc["neck_conv1"] = _conv(sd, "image_encoder.neck.0", bias=False)
    enc["neck_ln1"] = _ln2d(sd, "image_encoder.neck.1")
    enc["neck_conv2"] = _conv(sd, "image_encoder.neck.2", bias=False)
    enc["neck_ln2"] = _ln2d(sd, "image_encoder.neck.3")

    pe: dict = {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": _t(
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
            )
        },
        "not_a_point_embed": _t(sd["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask_embed": _t(sd["prompt_encoder.no_mask_embed.weight"])[0],
    }
    for i in range(4):
        pe[f"point_embed_{i}"] = _t(sd[f"prompt_encoder.point_embeddings.{i}.weight"])[0]

    def attn_ds(p):
        return {
            "q_proj": _dense(sd, f"{p}.q_proj"),
            "k_proj": _dense(sd, f"{p}.k_proj"),
            "v_proj": _dense(sd, f"{p}.v_proj"),
            "out_proj": _dense(sd, f"{p}.out_proj"),
        }

    dec: dict = {
        "iou_token": _t(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _t(sd["mask_decoder.mask_tokens.weight"]),
        "upscale_conv1": _conv_transpose(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln2d(sd, "mask_decoder.output_upscaling.1"),
        "upscale_conv2": _conv_transpose(sd, "mask_decoder.output_upscaling.3"),
        "iou_head": {
            f"layers{j}": _dense(sd, f"mask_decoder.iou_prediction_head.layers.{j}")
            for j in range(3)
        },
    }
    for i in range(4):
        dec[f"hypernet{i}"] = {
            f"layers{j}": _dense(
                sd, f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}"
            )
            for j in range(3)
        }
    tr: dict = {}
    for i in range(2):
        p = f"mask_decoder.transformer.layers.{i}"
        tr[f"layer{i}"] = {
            "self_attn": attn_ds(f"{p}.self_attn"),
            "cross_attn_token_to_image": attn_ds(f"{p}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": attn_ds(f"{p}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "norm4": _ln(sd, f"{p}.norm4"),
            "mlp_lin1": _dense(sd, f"{p}.mlp.lin1"),
            "mlp_lin2": _dense(sd, f"{p}.mlp.lin2"),
        }
    tr["final_attn_token_to_image"] = attn_ds("mask_decoder.transformer.final_attn_token_to_image")
    tr["norm_final_attn"] = _ln(sd, "mask_decoder.transformer.norm_final_attn")
    dec["transformer"] = tr

    return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec}


# -------------------------------------------------------------------- NNET
_B5_REPEATS = [3, 5, 5, 7, 7, 9, 3]


def convert_nnet(sd: dict) -> dict:
    """Convert the scannet NNET state_dict (geffnet tf_efficientnet_b5_ap
    encoder + refine decoder) to {params, batch_stats} for nets.nnet.NNET."""
    params: dict = {}
    stats: dict = {}
    E = "encoder.original_model"

    def conv_bn_act(dst, conv_name, bn_name, depthwise=False, bias=False):
        p_bn, s_bn = _bn(sd, bn_name)
        params[dst] = {
            "conv": _conv(sd, conv_name, bias=bias, depthwise=depthwise),
            "bn": p_bn,
        }
        stats[dst] = {"bn": s_bn}

    enc_p: dict = {}
    enc_s: dict = {}

    def enc_cba(dst, conv_name, bn_name, depthwise=False):
        p_bn, s_bn = _bn(sd, bn_name)
        enc_p[dst] = {
            "conv": _conv(sd, conv_name, bias=False, depthwise=depthwise),
            "bn": p_bn,
        }
        enc_s[dst] = {"bn": s_bn}

    enc_cba("stem", f"{E}.conv_stem", f"{E}.bn1")
    for si, reps in enumerate(_B5_REPEATS):
        for bi in range(reps):
            b = f"{E}.blocks.{si}.{bi}"
            dst = f"blocks_{si}_{bi}"
            se = {
                "conv_reduce": _conv(sd, f"{b}.se.conv_reduce"),
                "conv_expand": _conv(sd, f"{b}.se.conv_expand"),
            }
            if si == 0:
                # DepthwiseSeparable: conv_dw/bn1, se, conv_pw/bn2
                p1, s1 = _bn(sd, f"{b}.bn1")
                p2, s2 = _bn(sd, f"{b}.bn2")
                enc_p[dst] = {
                    "dw_conv": _conv(sd, f"{b}.conv_dw", bias=False, depthwise=True),
                    "dw_bn": p1,
                    "se": se,
                    "pw": {"conv": _conv(sd, f"{b}.conv_pw", bias=False), "bn": p2},
                }
                enc_s[dst] = {"dw_bn": s1, "pw": {"bn": s2}}
            else:
                # InvertedResidual: conv_pw/bn1, conv_dw/bn2, se, conv_pwl/bn3
                p1, s1 = _bn(sd, f"{b}.bn1")
                p2, s2 = _bn(sd, f"{b}.bn2")
                p3, s3 = _bn(sd, f"{b}.bn3")
                enc_p[dst] = {
                    "pw": {"conv": _conv(sd, f"{b}.conv_pw", bias=False), "bn": p1},
                    "dw_conv": _conv(sd, f"{b}.conv_dw", bias=False, depthwise=True),
                    "dw_bn": p2,
                    "se": se,
                    "pwl": {"conv": _conv(sd, f"{b}.conv_pwl", bias=False), "bn": p3},
                }
                enc_s[dst] = {
                    "pw": {"bn": s1}, "dw_bn": s2, "pwl": {"bn": s3}
                }
    # features[11] is the raw conv_head output (pre-bn2/pre-act2): the
    # reference Encoder.forward appends one feature per geffnet module and
    # the decoder taps index 11 = conv_head (scannet_model.py:17-25,96).
    # bn2/act2 feed only the removed classifier; their weights are unused.
    enc_p["head_conv"] = _conv(sd, f"{E}.conv_head", bias=False)
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    D = "decoder"
    params["conv2"] = _conv(sd, f"{D}.conv2")
    for i, up in enumerate(("up1", "up2", "up3", "up4"), 1):
        p0, s0 = _bn(sd, f"{D}.{up}._net.1")
        p1, s1 = _bn(sd, f"{D}.{up}._net.4")
        params[up] = {
            "conv0": _conv(sd, f"{D}.{up}._net.0"),
            "bn0": p0,
            "conv1": _conv(sd, f"{D}.{up}._net.3"),
            "bn1": p1,
        }
        stats[up] = {"bn0": s0, "bn1": s1}
    params["out_conv_res8"] = _conv(sd, f"{D}.out_conv_res8")

    def conv1d(name):
        w = _t(sd[f"{name}.weight"])  # (out, in, 1) -> (1, 1, in, out)
        return {
            "kernel": w[:, :, 0].T.reshape(1, 1, w.shape[1], w.shape[0]),
            "bias": _t(sd[f"{name}.bias"]),
        }

    for head, torch_head in (
        ("out_conv_res4", f"{D}.out_conv_res4"),
        ("out_conv_res2", f"{D}.out_conv_res2"),
        ("out_conv_res1", f"{D}.out_conv_res1"),
    ):
        params[head] = {
            "conv0": conv1d(f"{torch_head}.0"),
            "conv1": conv1d(f"{torch_head}.2"),
            "conv2": conv1d(f"{torch_head}.4"),
            "conv3": conv1d(f"{torch_head}.6"),
        }
    return {"params": params, "batch_stats": stats}


def strip_module_prefix(sd: dict) -> dict:
    """scannet checkpoints wrap keys in 'module.' (scannet_model.py:158-166)."""
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
