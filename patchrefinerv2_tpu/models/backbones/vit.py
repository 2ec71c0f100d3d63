"""DINOv2-style Vision Transformer trunk (flax.linen, NHWC input).

Capability match for external/depth_anything_v2/dinov2.py: patch-14 embed,
cls token, bicubic position-embedding interpolation with the DINO
``interpolate_offset=0.1`` scale-factor quirk (dinov2.py:182-210), pre-LN
blocks with LayerScale (init_values=1.0, dinov2.py:396-414), exact-GELU MLP,
and ``get_intermediate_layers(..., return_class_token=True, norm=True)``
(dinov2.py:297-324) exposed as an explicit list of tap indices — no hooks.

TPU-first details: fused qkv projection (one MXU matmul), attention through
ops/attention (XLA exact path or Pallas flash), bf16-friendly, static token
counts derived from the traced image shape.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.convs import gelu
from patchrefinerv2_tpu.ops.attention import mha
from patchrefinerv2_tpu.ops.resize import resize

VIT_CONFIGS = {
    # embed_dim, depth, num_heads (dinov2.py:340-395)
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
    # debug-tiny trunk for tests/dry runs (not a reference size)
    "vitt": dict(embed_dim=96, depth=4, num_heads=2),
}

# DPT tap indices per trunk size (external/depth_anything_v2/dpt.py:163-168)
INTERMEDIATE_LAYER_IDX = {
    "vits": [2, 5, 8, 11],
    "vitb": [2, 5, 8, 11],
    "vitl": [4, 11, 17, 23],
    "vitg": [9, 19, 29, 39],
    "vitt": [0, 1, 2, 3],
}


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, s, 3, self.num_heads, head_dim)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]
        o = mha(q, k, v)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, s, d)
        return nn.Dense(self.dim, use_bias=True, name="proj")(o)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = gelu(x)
        return nn.Dense(self.dim, name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: float | None = 1.0

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, name="attn")(h)
        if self.layerscale_init is not None:
            h = LayerScale(self.dim, self.layerscale_init, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(h)
        if self.layerscale_init is not None:
            h = LayerScale(self.dim, self.layerscale_init, name="ls2")(h)
        return x + h


class DinoViT(nn.Module):
    """Returns intermediate (patch_tokens, cls_token) pairs at ``taps``."""

    variant: str = "vits"
    patch_size: int = 14
    pos_grid: int = 37  # img_size 518 / patch 14
    interpolate_offset: float = 0.1
    layerscale_init: float | None = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, taps: Sequence[int] | None = None):
        cfg = VIT_CONFIGS[self.variant]
        dim, depth, heads = cfg["embed_dim"], cfg["depth"], cfg["num_heads"]
        taps = list(taps) if taps is not None else INTERMEDIATE_LAYER_IDX[self.variant]

        b, h, w, _ = x.shape
        h0, w0 = h // self.patch_size, w // self.patch_size
        tok = nn.Conv(
            dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        tok = tok.reshape(b, h0 * w0, dim)

        cls_token = self.param("cls_token", nn.initializers.normal(1e-6), (1, 1, dim))
        n_pos = self.pos_grid * self.pos_grid
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_pos + 1, dim)
        )

        if (h0, w0) != (self.pos_grid, self.pos_grid):
            # DINO quirk: bicubic with explicit scale_factor = (g+0.1)/grid
            # (dinov2.py:182-210)
            grid = pos_embed[:, 1:].reshape(1, self.pos_grid, self.pos_grid, dim)
            sh = float(h0 + self.interpolate_offset) / self.pos_grid
            sw = float(w0 + self.interpolate_offset) / self.pos_grid
            grid = resize(grid, (h0, w0), mode="bicubic", align_corners=False,
                          scale_override=(sh, sw))
            patch_pos = grid.reshape(1, h0 * w0, dim)
            pos = jnp.concatenate([pos_embed[:, :1], patch_pos], axis=1)
        else:
            pos = pos_embed

        tok = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, dim)), tok], axis=1)
        tok = tok + pos

        outputs = {}
        for i in range(depth):
            tok = Block(
                dim,
                heads,
                layerscale_init=self.layerscale_init,
                name=f"block{i}",
            )(tok)
            if i in taps:
                outputs[i] = tok

        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        result = []
        for i in taps:
            normed = final_norm(outputs[i])
            result.append((normed[:, 1:], normed[:, 0]))
        return result
