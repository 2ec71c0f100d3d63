"""DPT decode head over ViT tokens + the DepthAnythingV2 coarse model.

Capability match for external/depth_anything_v2/dpt.py:38-203 in NHWC:
token reassembly (1x1 project + per-level resize convs), 4-level scratch +
refinenet chain, and the metric head (sigmoid * max_depth). The forward
returns the depth AND the 6-level feature pyramid explicitly — the
``temp_features`` contract every estimator model consumes
(dpt.py:195-201): [x_d0(=layer_4_rn), x_blocks_feat_0..3(=path_4..path_1),
midas_final_feat(=out_feat, 128ch for DA2)].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.convs import relu
from patchrefinerv2_tpu.models.blocks.dpt import FeatureFusionBlock
from patchrefinerv2_tpu.models.backbones.vit import DinoViT, VIT_CONFIGS
from patchrefinerv2_tpu.ops.resize import resize

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

DA2_OUT_CHANNELS = {
    "vits": [48, 96, 192, 384],
    "vitb": [96, 192, 384, 768],
    "vitl": [256, 512, 1024, 1024],
    "vitg": [1536, 1536, 1536, 1536],
    "vitt": [24, 48, 96, 96],  # debug-tiny
}


class DPTHead(nn.Module):
    """4-level DPT head (dpt.py:38-150). Input: list of 4 (tokens, cls) pairs
    low->high block depth; returns (metric01, feats6)."""

    in_grid: tuple[int, int]  # (patch_h, patch_w)
    features: int = 256
    out_channels: Sequence[int] = (48, 96, 192, 384)

    @nn.compact
    def __call__(self, tap_tokens):
        ph, pw = self.in_grid
        levels = []
        for i, (tokens, _cls) in enumerate(tap_tokens):
            b, n, d = tokens.shape
            x = tokens.reshape(b, ph, pw, d)
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[0], (4, 4), strides=(4, 4), name="resize0"
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[1], (2, 2), strides=(2, 2), name="resize1"
                )(x)
            elif i == 3:
                # torch pads k//2 both sides on this stride-2 conv
                x = nn.Conv(
                    self.out_channels[3], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="resize3"
                )(x)
            levels.append(x)

        l1, l2, l3, l4 = levels
        l1rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer1_rn")(l1)
        l2rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer2_rn")(l2)
        l3rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer3_rn")(l3)
        l4rn = nn.Conv(self.features, (3, 3), use_bias=False, name="layer4_rn")(l4)

        p4 = FeatureFusionBlock(self.features, name="refinenet4")(l4rn, size=l3rn.shape[1:3])
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(p4, l3rn, size=l2rn.shape[1:3])
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(p3, l2rn, size=l1rn.shape[1:3])
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, l1rn)

        out = nn.Conv(self.features // 2, (3, 3), name="output_conv1")(p1)
        out_feat = resize(out, (ph * 14, pw * 14), mode="bilinear", align_corners=True)
        out = nn.Conv(32, (3, 3), name="output_conv2_0")(out_feat)
        out = relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_1")(out)
        out = nn.sigmoid(out)

        feats = [l4rn, p4, p3, p2, p1, out_feat]
        return out, feats


class DepthAnythingV2(nn.Module):
    """DA2 metric model (dpt.py:153-203). Input NHWC in [0,1]; output dict
    with 'metric_depth' (B,H,W,1) and the 6-level pyramid list."""

    encoder: str = "vits"
    features: int = 256
    max_depth: float = 20.0

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        ph, pw = x.shape[1] // 14, x.shape[2] // 14
        taps = DinoViT(variant=self.encoder, name="pretrained")(x)
        out_channels = DA2_OUT_CHANNELS[self.encoder]
        depth01, feats = DPTHead(
            in_grid=(ph, pw),
            features=self.features,
            out_channels=tuple(out_channels),
            name="depth_head",
        )(taps)
        depth = depth01 * self.max_depth
        return {
            "metric_depth": depth,
            "coarse_features": feats,
        }
