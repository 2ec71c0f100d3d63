"""SAM-style TwoWayTransformer + random-Fourier positional embedding for the
optional global-attention fusion path (glb_att).

Capability match:
* TwoWayTransformer / TwoWayAttentionBlock / downsampled Attention —
  estimator/models/blocks/transformers.py:41-272 (queries = patch features,
  keys = whole-image coarse features; 2 blocks of self-attn, token->image
  cross-attn, MLP, image->token cross-attn; final token->image attention).
* PositionEmbeddingRandom — estimator/models/blocks/position_embedding.py:
  28-76 (gaussian frequency matrix over [0,1]-normalized grid coords;
  pe_type='none' yields zeros).

Layout: NHWC feature maps in / out, flattened to tokens internally.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class DownsampledAttention(nn.Module):
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        head = internal // self.num_heads
        b, nq, _ = q.shape
        nk = k.shape[1]
        q = nn.Dense(internal, name="q_proj")(q).reshape(b, nq, self.num_heads, head)
        k = nn.Dense(internal, name="k_proj")(k).reshape(b, nk, self.num_heads, head)
        v = nn.Dense(internal, name="v_proj")(v).reshape(b, nk, self.num_heads, head)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head)
        att = nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, nq, internal)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class MLPBlock(nn.Module):
    mlp_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.mlp_dim, name="lin1")(x))
        return nn.Dense(self.out_dim, name="lin2")(x)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(self.embedding_dim, self.num_heads, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        queries = queries + MLPBlock(self.mlp_dim, self.embedding_dim, name="mlp")(queries)
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 1024
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, patch_embedding, patch_pe, whole_embedding, whole_pe):
        """All inputs NHWC; returns (queries, keys) reshaped back to NHWC."""
        b, hp, wp, c = patch_embedding.shape
        _, hw, ww, _ = whole_embedding.shape
        queries = patch_embedding.reshape(b, hp * wp, c)
        q_pe = patch_pe.reshape(b, hp * wp, c)
        keys = whole_embedding.reshape(b, hw * ww, c)
        k_pe = whole_pe.reshape(b, hw * ww, c)

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim,
                self.num_heads,
                self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layer{i}",
            )(queries, keys, q_pe, k_pe)

        q = queries + q_pe
        k = keys + k_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries)
        return queries.reshape(b, hp, wp, c), keys.reshape(b, hw, ww, c)


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier 2D PE grid (position_embedding.py:28-76). Call with a
    static (h, w); returns (h, w, 2*num_pos_feats)."""

    num_pos_feats: int = 128
    scale: float = 1.0
    pe_type: str = ""

    @nn.compact
    def __call__(self, size: tuple[int, int]):
        h, w = size
        import jax

        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape: self.scale * jax.random.normal(key, shape, jnp.float32),
            (2, self.num_pos_feats),
        )
        if self.pe_type == "none":
            return jnp.zeros((h, w, self.num_pos_feats * 2), jnp.float32)
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy = jnp.broadcast_to(y[:, None], (h, w))
        xx = jnp.broadcast_to(x[None, :], (h, w))
        coords = jnp.stack([xx, yy], axis=-1)  # (h, w, 2), x first like ref
        coords = 2 * coords - 1
        proj = 2 * np.pi * (coords @ gauss)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
