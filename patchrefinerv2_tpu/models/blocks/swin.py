"""Swin windowed attention + G2LFusion (global-to-local context injection
for PatchFusion).

Capability match for estimator/models/blocks/swin_layers.py:
* WindowAttention (:85-168) — window MSA with relative position bias,
* SwinTransformerBlock (:171-268) — pad to window multiples, cyclic shift,
  shifted-window attention mask, MLP,
* G2LBasicLayer (:271-358) — depth blocks alternating shift 0 / ws//2,
* G2LFusion (:360-431) — optional input projection, optional area-prior
  embedding, absolute position embedding, final LayerNorm.

All static shapes (window partition via reshape), NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.models.blocks.convs import gelu


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (num_windows*B, N, C); mask: (num_windows, N, N) or None."""
        bw, n, c = x.shape
        ws = self.window_size
        hd = c // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, hd)
        q, k, v = [jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)]
        scale = hd**-0.5
        att = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        idx = jnp.asarray(_rel_pos_index(ws, ws))
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        att = att + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            nw = mask.shape[0]
            att = att.reshape(bw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            att = att.reshape(bw, self.num_heads, n, n)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
        out = jnp.transpose(out.astype(x.dtype), (0, 2, 1, 3)).reshape(bw, n, c)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, b, h, w, c):
    x = wins.reshape(b, h // ws, w // ws, ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, c)


def _shift_attn_mask(hp, wp, ws, shift):
    """(num_windows, N, N) additive mask for shifted windows."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    wins = img.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, self.shift))
        else:
            mask = None
        wins = _window_partition(y, ws)
        wins = WindowAttention(self.dim, ws, self.num_heads, name="attn")(wins, mask)
        y = _window_reverse(wins, ws, b, hp, wp, c)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y
        z = nn.LayerNorm(name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(z)
        z = gelu(z)
        z = nn.Dense(self.dim, name="fc2")(z)
        return x + z


class G2LFusion(nn.Module):
    """Whole-image context via swin blocks + absolute position embedding
    (swin_layers.py:360-431). Input/output NHWC."""

    input_dim: int
    embed_dim: int
    window_size: int = 12
    num_heads: int = 8
    depth: int = 2
    num_patches: int = 0
    ape: bool = True

    @nn.compact
    def __call__(self, x, area_prior=None):
        if self.input_dim != self.embed_dim:
            x = nn.Conv(self.embed_dim, (3, 3), name="proj_x")(x)
        if area_prior is not None:
            x = x + nn.Conv(self.embed_dim, (1, 1), name="embed_proj")(area_prior)
        b, h, w, c = x.shape
        if self.ape:
            ape = self.param(
                "absolute_pos_embed", nn.initializers.normal(0.02),
                (1, self.num_patches, self.embed_dim),
            )
            x = x + ape.reshape(1, h, w, self.embed_dim)
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.window_size // 2
            x = SwinBlock(
                self.embed_dim, self.num_heads, self.window_size, shift,
                name=f"block{i}",
            )(x)
        return nn.LayerNorm(name="g2l_layer_norm")(x)
