"""SAM ViT image encoder in Flax (channels-last).

Re-implementation of the Segment Anything image encoder (the reference
depends on the ``segment-anything`` package, frontend/segment/sam_tools.py)
from the published architecture: ViT with 16x16 patch embed, absolute
position embedding, windowed attention (window 14) with periodic global
blocks, decomposed relative position bias, and a 2-conv LayerNorm neck to
256 channels.  ViT-H: embed 1280, depth 32, heads 16, global at 7/15/23/31.

All shapes static; jits cleanly for the MXU (attention matmuls in fp32
accumulate).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    out_chans: int = 256
    # implementation choice for the GLOBAL attention blocks; same
    # parameters, same math, different lowering.  See GLOBAL_ATTN_IMPLS.
    global_attn_impl: str = "xla"
    # lowering for the WINDOWED blocks ("xla" materialized bias or "ext"
    # extended-head matmul; flash never pays at 196-token windows)
    windowed_attn_impl: str = "xla"
    # keep the tensor in window layout across each consecutive run of
    # windowed blocks (partition once per run instead of per block); the
    # pad-region is re-zeroed after every norm1 so the math is exactly the
    # per-block partition semantics.  Trades 2 layout transposes per block
    # for MLP work on the (~20%) padded tokens.
    persistent_windows: bool = False
    # tanh-approximate GELU in the MLPs (exact erf GELU is transcendental-
    # heavy on the VPU; the approximation's ~1e-3 relative deviation is
    # below bf16 noise).  Off for checkpoint-validation parity.
    gelu_approx: bool = False
    # with persistent_windows: run norm1/norm2/MLP only on the VALID tokens
    # of the window grid (four static slices), assembling pad positions as
    # zeros.  Pad-token compute is provably dead — pads are re-zeroed after
    # norm1 before every attention and cropped at unpartition — and costs
    # ~20% of the MLP FLOPs at 64x64/window-14.  Valid-token outputs are
    # bit-identical (tests/test_nets_frontend.py).
    skip_pad_compute: bool = False


VIT_H = ViTConfig()
VIT_B = ViTConfig(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11))
VIT_TINY_TEST = ViTConfig(
    img_size=64, embed_dim=32, depth=2, num_heads=2, window_size=2,
    global_attn_indexes=(1,), out_chans=16,
)

# Global-attention implementations (param tree identical across all):
#   "xla"    — materialized scores + decomposed rel-pos adds (reference
#              math, reference memory behavior);
#   "ext"    — rel-pos folded into the QK contraction via extended heads
#              (one pure matmul builds the scores; no (L, L) bias adds);
#   "ext_hp" — "ext" with the head axis kept in place: q/k/v stay
#              (B, L, nh, hd) slices of the qkv projection and every
#              contraction carries nh as a batch dim — no (3, B*nh, L, hd)
#              repack transposes on either side of the attention.
#              NEGATIVE RESULT (round-3 chip A/B; ledger in examples/profile_encoder.py):
#              ~6-10 ms SLOWER than "ext" in situ — XLA lowers the
#              interior-batch einsums worse than the explicit repack.
#              Kept (parity-tested) so the attempt is on record;
#   "flash"  — extended heads + the Pallas TPU flash-attention kernel (no
#              (L, L) score materialization at all; TPU-only).
GLOBAL_ATTN_IMPLS = ("xla", "ext", "ext_hp", "flash")


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over the last axis of (B, H, W, C) with eps 1e-6."""

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-6) * w + b


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select relative position embeddings (SAM's decomposed scheme).

    ``rel_pos`` is (2 * max_size - 1, head_dim); assumes q_size == k_size
    (always true here), so no interpolation is needed at matched sizes.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    assert rel_pos.shape[0] == max_rel_dist, (rel_pos.shape, max_rel_dist)
    q_coords = jnp.arange(q_size)[:, None]
    k_coords = jnp.arange(k_size)[None, :]
    relative = (q_coords - k_coords) + (k_size - 1)
    return rel_pos[relative]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """attn (B*nh, qh*qw, kh*kw) += decomposed rel-pos terms."""
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)   # (q_h, k_h, C)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B = q.shape[0]
    r_q = q.reshape(B, q_h, q_w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


def extended_qk(q, k, rel_pos_h, rel_pos_w, hw, scale):
    """Fold decomposed rel-pos into the QK contraction (extended heads).

    scores = (q*scale)@k^T + rel_h + rel_w is exactly q_ext @ k_ext^T with
      q_ext = [q*scale | q@Rh[row_i]^T | q@Rw[col_i]^T]   (B, L, C + H + W)
      k_ext = [k       | onehot(row_j) | onehot(col_j)]
    because rel_h[i, j] depends on j only through row(j) (and rel_w through
    col(j)).  Turns the two (L, L)-materializing bias adds of
    :func:`add_decomposed_rel_pos` into extra contraction lanes — pure MXU
    work, and a flash-attention-compatible form.
    """
    H, W = hw
    B, L, _ = q.shape
    Rh = get_rel_pos(H, H, rel_pos_h)                       # (H, H, C)
    Rw = get_rel_pos(W, W, rel_pos_w)                       # (W, W, C)
    r_q = q.reshape(B, H, W, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh).reshape(B, L, H)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw).reshape(B, L, W)
    q_ext = jnp.concatenate([q * scale, rel_h, rel_w], axis=-1)
    oh_row = jnp.repeat(jnp.eye(H, dtype=q.dtype), W, axis=0)   # (L, H)
    oh_col = jnp.tile(jnp.eye(W, dtype=q.dtype), (H, 1))        # (L, W)
    k_ext = jnp.concatenate(
        [
            k,
            jnp.broadcast_to(oh_row[None], (B, L, H)),
            jnp.broadcast_to(oh_col[None], (B, L, W)),
        ],
        axis=-1,
    )
    return q_ext, k_ext


class Attention(nn.Module):
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple[int, int] = (14, 14)
    impl: str = "xla"  # one of GLOBAL_ATTN_IMPLS; non-"xla" needs use_rel_pos
    grid: tuple | None = None  # (nwh, nww, rh, rw): skip pad-token qkv/proj

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        L = H * W
        dense_qkv = nn.Dense(3 * C, name="qkv")
        skip_pad = self.grid is not None and (self.grid[2] or self.grid[3])
        if skip_pad:
            # pad tokens are zeros here (skip_pad_compute norm1), so their
            # QKV rows are exactly the projection bias — fill instead of
            # projecting ~20% dead rows.  Attention still reads pad K/V
            # (softmax denominators), so the fill must be exact.
            bias_row = dense_qkv(jnp.zeros((1, C), x.dtype))
            qkv = apply_tokenwise_valid(x, self.grid, dense_qkv, fill=bias_row[0])
            qkv = qkv.reshape(B, L, 3 * C)
        else:
            qkv = dense_qkv(x.reshape(B, L, C))

        scale = head_dim**-0.5
        if self.impl == "ext_hp" and self.use_rel_pos:
            # heads-in-place: (B, L, 3, nh, hd) slices, nh rides as an
            # einsum batch dim end to end — no qkv repack transposes and
            # no post-attention head-merge transpose
            nh = self.num_heads
            qkv = qkv.reshape(B, L, 3, nh, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim),
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim),
            )
            Rh = get_rel_pos(H, H, rel_h)                     # (H, H, hd)
            Rw = get_rel_pos(W, W, rel_w)
            rq = q.reshape(B, H, W, nh, head_dim)
            rel_hq = jnp.einsum("bxync,xkc->bxynk", rq, Rh).reshape(B, L, nh, H)
            rel_wq = jnp.einsum("bxync,ykc->bxynk", rq, Rw).reshape(B, L, nh, W)
            q_ext = jnp.concatenate([q * scale, rel_hq, rel_wq], axis=-1)
            oh_row = jnp.repeat(jnp.eye(H, dtype=q.dtype), W, axis=0)  # (L, H)
            oh_col = jnp.tile(jnp.eye(W, dtype=q.dtype), (H, 1))       # (L, W)
            k_ext = jnp.concatenate(
                [
                    k,
                    jnp.broadcast_to(oh_row[:, None, :], (B, L, nh, H)),
                    jnp.broadcast_to(oh_col[:, None, :], (B, L, nh, W)),
                ],
                axis=-1,
            )
            attn = jnp.einsum("bqnc,bknc->bnqk", q_ext, k_ext)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(B, H, W, C)
            return nn.Dense(C, name="proj")(out)

        qkv = qkv.reshape(B, L, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads, L, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim)
            )

        if self.impl == "xla" or not self.use_rel_pos:
            attn = jnp.einsum(
                "bqc,bkc->bqk", q * scale, k, precision=jax.lax.Precision.DEFAULT
            )
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(attn, q, rel_h, rel_w, (H, W), (H, W))
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bqk,bkc->bqc", attn, v)
        elif self.impl == "ext":
            q_ext, k_ext = extended_qk(q, k, rel_h, rel_w, (H, W), scale)
            attn = jnp.einsum("bqc,bkc->bqk", q_ext, k_ext)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bqk,bkc->bqc", attn, v)
        elif self.impl == "skip":
            # profiling ablation ONLY: keep the qkv/proj matmuls, skip the
            # score/softmax/AV math (bounds the attention cost by difference)
            out = v
        elif self.impl == "flash":
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            q_ext, k_ext = extended_qk(q, k, rel_h, rel_w, (H, W), scale)
            D = q_ext.shape[-1]
            Dp = -(-D // 128) * 128  # Mosaic wants lane-aligned head dims
            pad_qk = ((0, 0), (0, 0), (0, Dp - D))
            pad_v = ((0, 0), (0, 0), (0, Dp - head_dim))
            out = flash_attention(
                jnp.pad(q_ext, pad_qk)[None],
                jnp.pad(k_ext, pad_qk)[None],
                jnp.pad(v, pad_v)[None],
                sm_scale=1.0,
            )[0][..., :head_dim]
        else:
            raise ValueError(f"unknown attention impl {self.impl!r}")
        out = out.reshape(B, self.num_heads, H * W, head_dim).transpose(0, 2, 1, 3)
        out = out.reshape(B, H, W, C)
        if skip_pad:
            # pad-query outputs only ever feed pad residuals (dead) —
            # zeros instead of projecting them
            return apply_tokenwise_valid(out, self.grid, nn.Dense(C, name="proj"))
        return nn.Dense(C, name="proj")(out)


def window_partition(x, window):
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, window, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window // window)
    x = windows.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def apply_tokenwise_valid(xw, grid, fn, fill=None):
    """Apply a tokenwise ``fn`` to the VALID tokens of a window-layout tensor,
    writing ``fill`` (default zeros) at pad positions.

    ``xw`` is (B*nwh*nww, ws, ws, C); ``grid`` = (nwh, nww, rh, rw) where
    rh/rw are the number of valid rows/cols in the last window row/column
    (0 = fully valid).  The valid set decomposes into four static slices
    (full windows, bottom strip, right strip, corner), so no gather/scatter
    is needed — only slices and static updates.  ``fn`` must be tokenwise
    (LayerNorm/Dense/MLP): each output token depends only on its own input
    token, so slicing cannot change valid-token values.  ``fill`` is what
    ``fn`` would produce on a zero token when that matters downstream (the
    QKV projection's bias, for pad keys/values that attention still reads).
    """
    nwh, nww, rh, rw = grid
    ws = xw.shape[1]
    B = xw.shape[0] // (nwh * nww)
    C = xw.shape[-1]
    x6 = xw.reshape(B, nwh, nww, ws, ws, C)
    fh = nwh - (1 if rh else 0)  # window rows with all ws rows valid
    fw = nww - (1 if rw else 0)
    full = fn(x6[:, :fh, :fw])
    if fill is None:
        out = jnp.zeros(x6.shape[:-1] + (full.shape[-1],), full.dtype)
    else:
        out = jnp.broadcast_to(
            fill.astype(full.dtype), x6.shape[:-1] + (full.shape[-1],)
        )
    out = out.at[:, :fh, :fw].set(full)
    if rh:
        out = out.at[:, fh:, :fw, :rh].set(fn(x6[:, fh:, :fw, :rh]))
    if rw:
        out = out.at[:, :fh, fw:, :, :rw].set(fn(x6[:, :fh, fw:, :, :rw]))
    if rh and rw:
        out = out.at[:, fh:, fw:, :rh, :rw].set(fn(x6[:, fh:, fw:, :rh, :rw]))
    return out.reshape(xw.shape[:-1] + (out.shape[-1],))


class Block(nn.Module):
    cfg: ViTConfig
    window_size: int  # 0 = global
    pre_windowed: bool = False  # input already in (B*nw, ws, ws, C) layout
    grid: tuple | None = None  # (nwh, nww, rh, rw) for skip_pad_compute

    @nn.compact
    def __call__(self, x, pad_mask=None):
        norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1")
        skip_pad = (
            self.pre_windowed
            and self.cfg.skip_pad_compute
            and self.grid is not None
            and (self.grid[2] or self.grid[3])
        )
        shortcut = x
        if skip_pad:
            # norm only the valid tokens; pads assemble as the zeros the
            # pad_mask multiply would produce
            h = apply_tokenwise_valid(x, self.grid, norm1)
        else:
            h = norm1(x)
        if self.window_size > 0:
            size = (self.window_size, self.window_size)
            impl = self.cfg.windowed_attn_impl
            if self.pre_windowed:
                if not skip_pad and pad_mask is not None:
                    # persistent window layout: re-zero the pad region so
                    # the attention sees exactly the zeros that a fresh
                    # window_partition of the normed tensor would pad with
                    # (pad_mask is None when skip_pad_compute found no pads)
                    h = h * pad_mask
            else:
                H, W = h.shape[1], h.shape[2]
                h, pad_hw = window_partition(h, self.window_size)
        else:
            size = (h.shape[1], h.shape[2])
            impl = self.cfg.global_attn_impl
        h = Attention(
            self.cfg.num_heads, input_size=size, impl=impl,
            grid=self.grid if skip_pad else None, name="attn",
        )(h)
        if self.window_size > 0 and not self.pre_windowed:
            h = window_unpartition(h, self.window_size, pad_hw, (x.shape[1], x.shape[2]))
        x = shortcut + h
        norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")
        lin1 = nn.Dense(int(self.cfg.embed_dim * self.cfg.mlp_ratio), name="mlp_lin1")
        lin2 = nn.Dense(self.cfg.embed_dim, name="mlp_lin2")

        def mlp(t):
            return lin2(nn.gelu(lin1(norm2(t)), approximate=self.cfg.gelu_approx))

        if skip_pad:
            # pad-token MLP outputs only ever feed pad residuals (re-zeroed
            # after norm1, cropped at unpartition) — skip the ~20% dead work
            return x + apply_tokenwise_valid(x, self.grid, mlp)
        return x + mlp(x)


class ImageEncoderViT(nn.Module):
    cfg: ViTConfig = VIT_H

    @nn.compact
    def __call__(self, x):
        """(B, img_size, img_size, 3) -> (B, S, S, out_chans), S = img/patch."""
        cfg = self.cfg
        S = cfg.img_size // cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size, padding="VALID", name="patch_embed",
        )(x)
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, S, S, cfg.embed_dim)
        )
        x = x + pos
        if not cfg.persistent_windows:
            for i in range(cfg.depth):
                ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
                x = Block(cfg, ws, name=f"block{i}")(x)
        else:
            # partition once per consecutive run of windowed blocks; the
            # per-block pad re-zeroing in Block keeps the math identical to
            # the per-block partition scheme (asserted in tests)
            H, W = x.shape[1], x.shape[2]
            ws = cfg.window_size
            i = 0
            while i < cfg.depth:
                if i in cfg.global_attn_indexes:
                    x = Block(cfg, 0, name=f"block{i}")(x)
                    i += 1
                    continue
                j = i
                while j < cfg.depth and j not in cfg.global_attn_indexes:
                    j += 1
                xw, pad_hw = window_partition(x, ws)
                grid = (pad_hw[0] // ws, pad_hw[1] // ws, H % ws, W % ws)
                if cfg.skip_pad_compute:
                    pad_mask = None  # zeros assembled by apply_tokenwise_valid
                else:
                    ones = jnp.ones((x.shape[0], H, W, 1), x.dtype)
                    pad_mask, _ = window_partition(ones, ws)
                for k in range(i, j):
                    xw = Block(
                        cfg, ws, pre_windowed=True, grid=grid, name=f"block{k}"
                    )(xw, pad_mask)
                x = window_unpartition(xw, ws, pad_hw, (H, W))
                i = j
        # neck: conv1x1 -> LN -> conv3x3 -> LN
        x = nn.Conv(cfg.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(cfg.out_chans, (3, 3), padding=1, use_bias=False, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x
