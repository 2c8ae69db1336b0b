"""SAM mask decoder in Flax: two-way transformer + mask/IoU heads.

Produces 4 mask logits per prompt (1 "whole" + 3 multimask outputs) and IoU
predictions; the reference consumes ``multimask_output=True`` giving masks
1..3 with their IoU scores (frontend/segment/sam_tools.py:20-45).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .image_encoder import LayerNorm2d


class AttentionDS(nn.Module):
    """Multi-head attention with optional internal downsampling."""

    embed_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embed_dim // self.downsample_rate
        hd = d // self.num_heads
        B, Nq, _ = q.shape
        Nk = k.shape[1]

        def split(x, name):
            x = nn.Dense(d, name=name)(x)
            return x.reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh = split(q, "q_proj")
        kh = split(k, "k_proj")
        vh = split(v, "v_proj")
        attn = jnp.einsum("bhqc,bhkc->bhqk", qh, kh) / jnp.sqrt(hd).astype(q.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, d)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # self attention on tokens
        if self.skip_first_layer_pe:
            queries = AttentionDS(self.embed_dim, self.num_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            attn_out = AttentionDS(self.embed_dim, self.num_heads, name="self_attn")(
                q, q, queries
            )
            queries = queries + attn_out
        queries = nn.LayerNorm(name="norm1")(queries)

        # cross attention: tokens -> image
        q = queries + query_pe
        k = keys + key_pe
        attn_out = AttentionDS(
            self.embed_dim, self.num_heads, 2, name="cross_attn_token_to_image"
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(name="norm2")(queries)

        # mlp
        h = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim, name="mlp_lin2")(h)
        queries = queries + h
        queries = nn.LayerNorm(name="norm3")(queries)

        # cross attention: image -> tokens
        q = queries + query_pe
        k = keys + key_pe
        attn_out = AttentionDS(
            self.embed_dim, self.num_heads, 2, name="cross_attn_image_to_token"
        )(k, q, queries)
        keys = keys + attn_out
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding (B, H, W, C); point_embedding (B, N, C)."""
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = image_pe.reshape(1, H * W, C) if image_pe.ndim == 4 else image_pe
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        attn_out = AttentionDS(
            self.embed_dim, self.num_heads, 2, name="final_attn_token_to_image"
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(name="norm_final_attn")(queries)
        return queries, keys


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers{i}")(x))
        x = nn.Dense(self.output_dim, name=f"layers{self.num_layers - 1}")(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    # tanh-approximate GELU in the upscaling head: the exact erf on the
    # (B, 128, 128, 64) + (B, 256, 256, 32) activations is ~13 ms of the
    # 320-prompt decode's ~60 ms device time (chip A/B, /tmp probe round 3;
    # same trade as the encoder's gelu_approx).  Off for checkpoint parity.
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        """image_embeddings (1, H, W, C) shared across B prompts;
        sparse_prompt (B, N, C); dense_prompt (B, H, W, C).

        Returns (masks (B, 4, 4H, 4W) logits, iou_pred (B, 4))."""
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (num_mask_tokens, self.transformer_dim),
        )
        B = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (B,) + output_tokens.shape),
             sparse_prompt], axis=1,
        )

        src = jnp.broadcast_to(image_embeddings, (B,) + image_embeddings.shape[1:])
        src = src + dense_prompt
        H, W, C = src.shape[1:]

        hs, src_out = TwoWayTransformer(
            embed_dim=self.transformer_dim,
            mlp_dim=8 * self.transformer_dim,  # 2048 at the SAM dim of 256
            name="transformer",
        )(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        src_img = src_out.reshape(B, H, W, C)
        up = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2), name="upscale_conv1"
        )(src_img)
        up = LayerNorm2d(name="upscale_ln")(up)
        up = nn.gelu(up, approximate=self.gelu_approx)
        up = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2), name="upscale_conv2"
        )(up)
        up = nn.gelu(up, approximate=self.gelu_approx)

        hyper = jnp.stack(
            [
                MLP(self.transformer_dim, self.transformer_dim // 8, 3,
                    name=f"hypernet{i}")(mask_tokens_out[:, i])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, 4, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou_pred = MLP(256, num_mask_tokens, 3, name="iou_head")(iou_token_out)
        return masks, iou_pred
