"""EfficientNet-B5 (tf_efficientnet_b5_ap) feature backbone in Flax.

Reference dependency: geffnet ``tf_efficientnet_b5_ap`` used as the surface
normal network's encoder (frontend/normals/scannet_model.py:7-25), which
taps intermediate features at stage outputs [4]=24ch(1/2), [5]=40ch(1/4),
[6]=64ch(1/8), [8]=176ch(1/16) and the 2048ch conv_head output (1/32)
(scannet_model.py:95).

Implementation notes:
  - tf_ variants use TensorFlow "SAME" (asymmetric) padding — reproduced
    exactly, it changes feature maps at odd resolutions;
  - BatchNorm eps 1e-3 (tf default); inference only (stats from checkpoint);
  - activation silu/swish; squeeze-excite on every MBConv block;
  - B5 scaling: width x1.6 (round to /8), depth x2.2 (ceil).

Channels-last (NHWC) throughout — the TPU-native layout.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# base (B0) stage specs: (repeats, kernel, stride, expand, out_ch)
_B0_STAGES = [
    (1, 3, 1, 1, 16),
    (2, 3, 2, 6, 24),
    (2, 5, 2, 6, 40),
    (3, 3, 2, 6, 80),
    (3, 5, 1, 6, 112),
    (4, 5, 2, 6, 192),
    (1, 3, 1, 6, 320),
]


def round_channels(c: float, mult: float, divisor: int = 8) -> int:
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def round_repeats(r: int, mult: float) -> int:
    return int(math.ceil(mult * r))


def tf_same_pad(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """TensorFlow SAME padding (asymmetric: extra pixel goes bottom/right)."""
    H, W = x.shape[1], x.shape[2]

    def pad_amount(size):
        out = -(-size // stride)
        total = max(0, (out - 1) * stride + kernel - size)
        return total // 2, total - total // 2

    ph = pad_amount(H)
    pw = pad_amount(W)
    return jnp.pad(x, ((0, 0), ph, pw, (0, 0)))


class ConvBnAct(nn.Module):
    out_ch: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = tf_same_pad(x, self.kernel, self.stride)
        x = nn.Conv(
            self.out_ch, (self.kernel, self.kernel), strides=self.stride,
            padding="VALID", use_bias=False, feature_group_count=self.groups,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        if self.act:
            x = nn.silu(x)
        return x


class SqueezeExcite(nn.Module):
    reduced_ch: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_ch, (1, 1), name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = ConvBnAct(in_ch * self.expand, 1, name="pw")(h)
        # depthwise
        h = tf_same_pad(h, self.kernel, self.stride)
        h = nn.Conv(
            h.shape[-1], (self.kernel, self.kernel), strides=self.stride,
            padding="VALID", use_bias=False, feature_group_count=h.shape[-1],
            name="dw_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="dw_bn")(h)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), name="se")(h)
        h = ConvBnAct(self.out_ch, 1, act=False, name="pwl")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class DepthwiseSeparable(nn.Module):
    """Stage-0 block (expand ratio 1): dw conv + SE + pw linear."""

    out_ch: int
    kernel: int
    stride: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = tf_same_pad(x, self.kernel, self.stride)
        h = nn.Conv(
            in_ch, (self.kernel, self.kernel), strides=self.stride,
            padding="VALID", use_bias=False, feature_group_count=in_ch,
            name="dw_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="dw_bn")(h)
        h = nn.silu(h)
        h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), name="se")(h)
        h = ConvBnAct(self.out_ch, 1, act=False, name="pw")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNetFeatures(nn.Module):
    """Backbone emitting per-stage features.

    ``__call__`` returns (stage_outputs list of 7, head_output) where
    head_output is the 1/32-res conv_head feature (2048ch for B5),
    **pre-bn2/pre-activation**: the reference's Encoder.forward appends one
    entry per geffnet module (conv_stem, bn1, act1, blocks 0-6 = indices
    4-10, conv_head = index 11, ...) and the decoder taps ``features[11]``
    (scannet_model.py:17-25,96) — i.e. the raw conv_head output.  bn2/act2
    only feed the (removed) classifier and are not part of this model.
    """

    width_mult: float = 1.6
    depth_mult: float = 2.2
    head_ch: int = 2048

    @nn.compact
    def __call__(self, x):
        stem_ch = round_channels(32, self.width_mult)
        x = ConvBnAct(stem_ch, 3, stride=2, name="stem")(x)

        stage_outputs = []
        for si, (r, k, s, e, c) in enumerate(_B0_STAGES):
            reps = round_repeats(r, self.depth_mult)
            out_ch = round_channels(c, self.width_mult)
            for bi in range(reps):
                stride = s if bi == 0 else 1
                if e == 1:
                    x = DepthwiseSeparable(
                        out_ch, k, stride, name=f"blocks_{si}_{bi}"
                    )(x)
                else:
                    x = MBConv(out_ch, k, stride, e, name=f"blocks_{si}_{bi}")(x)
            stage_outputs.append(x)

        head = nn.Conv(
            self.head_ch, (1, 1), use_bias=False, name="head_conv"
        )(x)
        return stage_outputs, head
