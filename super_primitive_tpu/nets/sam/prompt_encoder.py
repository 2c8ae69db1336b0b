"""SAM prompt encoder in Flax: random-Fourier positional encoding + learned
point-type embeddings (positive/negative/box corners/not-a-point) and the
no-mask dense embedding."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PositionEmbeddingRandom(nn.Module):
    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, coords01: jax.Array) -> jax.Array:
        """coords01 in [0, 1], shape (..., 2) -> (..., 2*num_pos_feats)."""
        mat = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: jax.random.normal(key, shape),
            (2, self.num_pos_feats),
        )
        c = 2.0 * coords01 - 1.0
        c = c @ mat
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: tuple[int, int] = (64, 64)
    input_image_size: tuple[int, int] = (1024, 1024)

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 0: negative point, 1: positive point, 2: box tl, 3: box br
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0), (self.embed_dim,))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )

    def _embed_coords(self, coords_px: jax.Array) -> jax.Array:
        """Pixel coords (+0.5 center shift, SAM convention) -> PE."""
        c = (coords_px + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        return self.pe_layer(c)

    def __call__(self, point_coords: jax.Array, point_labels: jax.Array):
        """Points (B, N, 2) in input-image pixels (x, y) with labels (B, N)
        in {-1 pad, 0 neg, 1 pos}.  SAM appends one padding point when no box
        is given; callers include it as a label=-1 entry.

        Returns (sparse (B, N, D), dense (B, H, W, D))."""
        pe = self._embed_coords(point_coords)
        lab = point_labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed, pe + jnp.where(
            lab == 1, self.point_embeddings[1], self.point_embeddings[0]))
        emb = jnp.where(lab == -1, self.not_a_point_embed, emb)
        H, W = self.image_embedding_size
        dense = jnp.broadcast_to(
            self.no_mask_embed, (point_coords.shape[0], H, W, self.embed_dim)
        )
        return emb, dense

    def get_dense_pe(self) -> jax.Array:
        """Positional encoding of the image-embedding grid (1, H, W, D)."""
        H, W = self.image_embedding_size
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
        return self.pe_layer(grid)[None]
