"""GuidedFusionPatchFusion: U-Net over concat(coarse_roi_depth, fine_depth,
crop_rgb) with per-scale G2L swin context injection
(estimator/models/blocks/guided_fusion_model.py:33-191).

TPU-first split: the reference re-runs G2L on (patch-repeated) whole-image
coarse features inside every chunk's forward; here ``g2l_whole`` computes
the swin-transformed whole-image features ONCE per image and the decoder
only roi-aligns them per chunk — identical math, large wall-clock saving.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.models.blocks.swin import G2LFusion
from patchrefinerv2_tpu.ops.resize import resize
from patchrefinerv2_tpu.ops.roi_align import roi_align


class DoubleConvWOBN(nn.Module):
    out_ch: int
    mid_ch: int | None = None

    @nn.compact
    def __call__(self, x):
        mid = self.mid_ch or self.out_ch
        x = nn.relu(nn.Conv(mid, (3, 3), use_bias=True)(x))
        return nn.relu(nn.Conv(self.out_ch, (3, 3), use_bias=True)(x))


class DoubleConvBN(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # BN-under-DP semantics via parallel/bn.py (names pinned so both
        # paths share the nn.BatchNorm variable tree)
        from patchrefinerv2_tpu.parallel.bn import GroupedBatchNorm, bn_groups

        g = bn_groups()

        def bn(h, name):
            if train and g > 1:
                return GroupedBatchNorm(
                    groups=g, momentum=0.9, epsilon=1e-5, name=name)(h)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name)(h)

        x = nn.Conv(self.out_ch, (3, 3), use_bias=False)(x)
        x = nn.relu(bn(x, "BatchNorm_0"))
        x = nn.Conv(self.out_ch, (3, 3), use_bias=False)(x)
        return nn.relu(bn(x, "BatchNorm_1"))


class Down(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConvBN(self.out_ch)(x, train)


@MODELS.register_module()
class GuidedFusionPatchFusion(nn.Module):
    n_channels: int = 5
    g2l: bool = True
    in_channels: Sequence[int] = (32, 256, 256, 256, 256, 256)
    depth: Sequence[int] = (2, 2, 3, 3, 4, 4)
    num_heads: Sequence[int] = (8, 8, 16, 16, 32, 32)
    num_patches: Sequence[int] = (384 * 512, 192 * 256, 96 * 128, 48 * 64, 24 * 32, 12 * 16)
    patch_process_shape: Sequence[int] = (384, 512)
    window: int = 12

    def setup(self):
        inv = list(self.in_channels)[::-1]
        self.inc = DoubleConvBN(self.in_channels[0])
        self.down_list = [Down(c) for c in self.in_channels[1:]]
        # Upv1 mid width = full concat width (guided_fusion_model.py:86-95)
        self.up_list = [
            DoubleConvWOBN(inv[i], mid_ch=inv[i] + 2 * inv[i - 1])
            for i in range(1, len(inv))
        ]
        if self.g2l:
            heads_inv = list(self.num_heads)[::-1]
            depth_inv = list(self.depth)[::-1]
            patches_inv = list(self.num_patches)[::-1]
            self.g2l_list = [
                G2LFusion(
                    input_dim=inv[i],
                    embed_dim=inv[i],
                    window_size=self.window,
                    num_heads=heads_inv[i],
                    depth=depth_inv[i],
                    num_patches=patches_inv[i],
                )
                for i in range(len(inv))
            ]
            self.conv_list = [DoubleConvWOBN(inv[i], inv[i]) for i in range(len(inv))]

    def g2l_whole(self, coarse_feat_whole, area_prior=None):
        """Swin-contextualize whole-image coarse features once per image.
        coarse_feat_whole: low-res-first list of 6."""
        if not self.g2l:
            return list(coarse_feat_whole)
        out = []
        for i, feat in enumerate(coarse_feat_whole):
            out.append(self.g2l_list[i](feat, area_prior))
        return out

    def __call__(
        self,
        input_tensor,
        guide_plus,
        guide_cat,
        bbox,
        g2l_feats_whole,
        train: bool = False,
    ):
        """Per-chunk decode. guide_cat: low-res-first list of 6 fused feats;
        g2l_feats_whole: low-res-first whole-image features (already swin-
        processed); bbox: (P, 4) process-coord boxes. Returns low-res-first
        list of 6 fused pyramid levels."""
        pph = self.patch_process_shape[0]
        n = bbox.shape[0]
        zeros_idx = jnp.zeros((n,), jnp.int32)

        feats = []
        x = self.inc(input_tensor, train)
        feats.append(x)
        for layer in self.down_list:
            x = layer(x, train)
            feats.append(x)
        feats_inv = feats[::-1]  # low-res first

        outputs = []
        temp = None
        for i, (feat_enc, feat_c_whole) in enumerate(zip(feats_inv, g2l_feats_whole)):
            h, w = feat_c_whole.shape[1:3]
            if feat_enc.shape[1:3] != (h, w):
                feat_enc = resize(feat_enc, (h, w), "bilinear", True)
            if i > 0:
                x1 = jnp.concatenate([temp, guide_cat[i - 1]], axis=-1)
                x1 = resize(x1, feat_enc.shape[1:3], "bilinear", True)
                feat_enc = self.up_list[i - 1](jnp.concatenate([feat_enc, x1], axis=-1))
            feat_c = roi_align(feat_c_whole, bbox, zeros_idx, (h, w), h / pph)
            x = self.conv_list[i](jnp.concatenate([feat_enc, feat_c], axis=-1))
            temp = x
            outputs.append(x)
        return outputs
