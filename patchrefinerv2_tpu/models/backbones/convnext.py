"""ConvNeXt / ConvNeXtV2 feature encoders (timm 'convnext_large',
'convnextv2_large(.fcmae_ft_in22k_in1k_384)' equivalents for the refiner,
lightweight_refiner.py:260-283).

ConvNeXt-L: stem 4x4/s4 + LN, stages depths (3,3,27,3) dims
(192,384,768,1536); block = 7x7 depthwise -> LN -> 4x pointwise MLP with
GELU -> pointwise, layer-scale gamma (v1) or GRN inside the MLP (v2).
features_only taps the 4 stage outputs at /4 /8 /16 /32.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.convs import gelu


class GRN(nn.Module):
    """Global response normalization (ConvNeXtV2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtBlock(nn.Module):
    dim: int
    v2: bool = False
    ls_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(self.dim * 4, name="pwconv1")(h)
        h = gelu(h)
        if self.v2:
            h = GRN(self.dim * 4, name="grn")(h)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        if not self.v2:
            gamma = self.param("gamma", nn.initializers.constant(self.ls_init), (self.dim,))
            h = gamma * h
        return x + h


class ConvNeXtFeatures(nn.Module):
    """features_only: 4 levels at /4 /8 /16 /32."""

    in_ch: int = 3
    depths: tuple = (3, 3, 27, 3)
    dims: tuple = (192, 384, 768, 1536)
    v2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN in convnext
        h = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_0")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="stem_1")(h)
        feats = []
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                h = nn.LayerNorm(epsilon=1e-6, name=f"downsample_norm{si}")(h)
                h = nn.Conv(dim, (2, 2), strides=(2, 2), name=f"downsample_conv{si}")(h)
            for bi in range(depth):
                h = ConvNeXtBlock(dim, v2=self.v2, name=f"stage{si}_block{bi}")(h)
            feats.append(h)
        return feats
