"""LightWeightRefiner: timm-style CNN encoder over high-res patches
(estimator/models/blocks/lightweight_refiner.py:241-321).

Input is the raw [0,1] patch crop plus (optionally) the roi-aligned coarse
depth as a 4th channel — the reference patches the pretrained stem to 4
channels (patchrefinerplus.py:144-200); here the encoder is simply built
with in_ch=4. Normalization uses the encoder's pretraining statistics and is
applied to the RGB channels before concatenation, exactly like the reference
(lightweight_refiner.py:293-298).

Returns (feats, out_depth): feats ordered low-res -> high-res (6 levels when
with_decoder=False: the top-resolution level is a 2x bilinear upsample of the
/2 feature, lightweight_refiner.py:314-317), out_depth zeros unless a
decoder head is attached.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.models.backbones.encoders import ENCODER_SPECS
from patchrefinerv2_tpu.models.blocks.dpt import SimpleDPTHead
from patchrefinerv2_tpu.ops.resize import resize


@MODELS.register_module()
class LightWeightRefiner(nn.Module):
    encoder_name: str = "tf_efficientnet_b5_ap"
    coarse_condition: bool = True
    with_decoder: bool = False
    cls_pretrain: bool = True  # kept for config-surface parity
    encoder_channels: Sequence[int] | None = None
    proj_channels: Sequence[int] | None = None
    decoder_channels: Sequence[int] | None = None
    coarse_feat_chl: Sequence[int] | None = None
    # checkpoint-derived arch override for spec-parameterized encoders
    # (mobilenetv4: convert_timm_mnv4(..., return_spec=True))
    encoder_spec: dict | None = None

    @nn.compact
    def __call__(self, crop_image, coarse_depth=None, train: bool = False):
        spec = ENCODER_SPECS[self.encoder_name]
        mean = jnp.asarray(spec["mean"], crop_image.dtype)
        std = jnp.asarray(spec["std"], crop_image.dtype)
        x = (crop_image - mean) / std
        if self.coarse_condition:
            x = jnp.concatenate([x, coarse_depth], axis=-1)
        enc_kwargs = {}
        if self.encoder_spec is not None:
            enc_kwargs["spec"] = self.encoder_spec
        enc = spec["cls"](in_ch=x.shape[-1], name="refiner_encoder", **enc_kwargs)
        features = enc(x, train=train)  # high-res -> low-res, 5 levels

        if self.with_decoder:
            feats, out_depth = SimpleDPTHead(features=256, name="decoder")(features)
            return feats, out_depth

        top = features[0]
        top_up = resize(
            top, (top.shape[1] * 2, top.shape[2] * 2), mode="bilinear", align_corners=True
        )
        features = [top_up] + list(features)
        feats = features[::-1]  # low-res -> high-res (6 levels)
        out_depth = jnp.zeros_like(crop_image[..., :1])
        return feats, out_depth


@MODELS.register_module()
class LightWeightRefinerPG(LightWeightRefiner):
    """Progressive-guidance refiner variant
    (estimator/models/blocks/lightweight_refiner_pg.py:140-183): a
    LightWeightRefiner whose decoder is always the SimpleDPTHead —
    registered for config-surface parity; no shipped reference config uses
    it (dead-registered there too)."""

    with_decoder: bool = True
