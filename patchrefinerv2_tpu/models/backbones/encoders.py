"""CNN feature encoders for the lightweight refiner (flax, NHWC).

Architecture-faithful re-implementations of the timm encoders the reference
instantiates via ``timm.create_model(..., features_only=True)``
(estimator/models/blocks/lightweight_refiner.py:260-262):

* ``tf_efficientnet_b5_ap`` — EfficientNet-B5 (width 1.6 / depth 2.2),
  TF SAME padding, SiLU, SE(0.25 of block input); feature taps at
  reductions 2/4/8/16/32 with channels [24, 40, 64, 176, 512]
  (== configs/patchrefinerv2_zoedepth/v2_eff_u4k.py fine_chl).
* ``mobilenetv3_large_100`` — taps [16, 24, 40, 112, 960].
* ``mobilenetv4_conv_small/medium/large`` — UIB blocks (extra-depthwise /
  inverted-residual / conv-next-like), taps per timm.
* ``convnext_large`` / ``convnextv2_large`` — ConvNeXt stages (v2 swaps
  LayerScale for GRN), taps [192, 384, 768, 1536] + stem.

All of the above are implemented below and converter-pinned against the
torch reference (tests/test_encoder_torch_parity.py,
tests/test_mnv4_torch_parity.py, tests/test_convert_timm.py).

Each encoder takes NHWC input (3 or 4 channels — the 4th is the coarse
depth condition; the reference patches the pretrained stem to 4 channels,
patchrefinerplus.py:144-200) and returns 5 feature maps ordered
high-resolution -> low-resolution (timm features_only order).

BatchNorm uses running stats under the 'batch_stats' collection; ``train``
toggles stat updates. tf_ variants use eps=1e-3 like timm.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def _silu(x):
    return nn.silu(x)


def _hardswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def _hardsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _BN(nn.Module):
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool):
        # reference BN-under-DP semantics (parallel/bn.py): per-data-shard
        # moments unless convert_syncbn=True resolves the group count to 1.
        # Same variable tree either way (name pinned to BatchNorm_0).
        from patchrefinerv2_tpu.parallel.bn import GroupedBatchNorm, bn_groups

        g = bn_groups()
        if train and g > 1:
            return GroupedBatchNorm(
                groups=g, momentum=0.9, epsilon=self.eps, name="BatchNorm_0"
            )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=self.eps,
            name="BatchNorm_0",
        )(x)


class SqueezeExcite(nn.Module):
    reduced: int
    gate: str = "sigmoid"  # 'sigmoid' (efficientnet) | 'hardsigmoid' (mnv3)
    act: str = "silu"  # 'silu' | 'relu'

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="reduce")(s)
        s = _silu(s) if self.act == "silu" else nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="expand")(s)
        g = nn.sigmoid(s) if self.gate == "sigmoid" else _hardsigmoid(s)
        return x * g


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_reduced: int | None
    act: str = "silu"  # 'silu' | 'relu' | 'hardswish'
    se_gate: str = "sigmoid"
    se_act: str = "silu"
    expand_ch: int | None = None  # explicit (mobilenetv3); else in_ch * expand
    # torch-native timm models (mobilenetv3/v4) pad k//2 on BOTH sides of a
    # strided conv; tf_ ports use asymmetric TF SAME. The two differ for
    # stride 2 (values shift by one at the top/left edge).
    torch_pad: bool = False
    bn_eps: float = 1e-3  # tf_ ports 1e-3; torch-native models 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        def act(v):
            return {"silu": _silu, "relu": nn.relu, "hardswish": _hardswish}[self.act](v)

        from patchrefinerv2_tpu.models.blocks.dpt import _ConvParams, _conv_same
        from patchrefinerv2_tpu.ops.quant import conv_dispatch

        # the 1x1 pointwise convs carry most of the encoder's FLOPs; give
        # them explicit params (same tree as nn.Conv) so the opt-in
        # int8 serving path (ops/quant.py, PRV2_INT8, calibrated or
        # dynamic scales) covers the refiner encoder too, not just the
        # C2F decoder
        pconv = conv_dispatch(self, x.dtype, _conv_same)
        in_ch = x.shape[-1]
        mid = self.expand_ch or in_ch * self.expand
        h = x
        if mid != in_ch:
            kpw, _ = _ConvParams((1, 1, in_ch, mid), use_bias=False, name="conv_pw")()
            h = pconv(h, kpw, None)
            h = _BN(eps=self.bn_eps, name="bn1")(h, train)
            h = act(h)
        k2 = self.kernel // 2
        h = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            feature_group_count=mid,
            use_bias=False,
            padding=((k2, k2), (k2, k2)) if self.torch_pad else "SAME",
            name="conv_dw",
        )(h)
        h = _BN(eps=self.bn_eps, name="bn2")(h, train)
        h = act(h)
        if self.se_reduced:
            h = SqueezeExcite(self.se_reduced, self.se_gate, self.se_act, name="se")(h)
        kpwl, _ = _ConvParams((1, 1, mid, self.out_ch), use_bias=False, name="conv_pwl")()
        h = pconv(h, kpwl, None)
        h = _BN(eps=self.bn_eps, name="bn3")(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


# (kernel, stride, expand, out_ch, repeats) for EfficientNet-B5
_EFFB5_STAGES = [
    # k, s, e, c, r   (B0 scaled by width 1.6 / depth 2.2)
    (3, 1, 1, 24, 3),
    (3, 2, 6, 40, 5),
    (5, 2, 6, 64, 5),
    (3, 2, 6, 128, 7),
    (5, 1, 6, 176, 7),
    (5, 2, 6, 304, 9),
    (3, 1, 6, 512, 3),
]


class EfficientNetB5Features(nn.Module):
    """tf_efficientnet_b5_ap features_only: taps after stages 0,1,2,4,6."""

    in_ch: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(48, (3, 3), strides=(2, 2), use_bias=False, padding="SAME", name="conv_stem")(x)
        h = _BN(name="bn_stem")(h, train)
        h = _silu(h)
        feats = []
        taps = {0, 1, 2, 4, 6}
        for si, (k, s, e, c, r) in enumerate(_EFFB5_STAGES):
            for bi in range(r):
                # timm SE reduction uses the block *input* channels
                se_red = max(1, int(h.shape[-1] * 0.25))
                h = MBConv(
                    out_ch=c,
                    kernel=k,
                    stride=s if bi == 0 else 1,
                    expand=e,
                    se_reduced=se_red,
                    act="silu",
                    name=f"blocks_{si}_{bi}",
                )(h, train)
            if si in taps:
                feats.append(h)
        return feats


# MobileNetV3-Large rows: (kernel, exp_ch, out_ch, se, act, stride)
_MNV3L_STAGES = [
    [(3, 16, 16, False, "relu", 1)],
    [(3, 64, 24, False, "relu", 2), (3, 72, 24, False, "relu", 1)],
    [(5, 72, 40, True, "relu", 2), (5, 120, 40, True, "relu", 1), (5, 120, 40, True, "relu", 1)],
    [
        (3, 240, 80, False, "hardswish", 2),
        (3, 200, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 480, 112, True, "hardswish", 1),
        (3, 672, 112, True, "hardswish", 1),
    ],
    [
        (5, 672, 160, True, "hardswish", 2),
        (5, 960, 160, True, "hardswish", 1),
        (5, 960, 160, True, "hardswish", 1),
    ],
]


class MobileNetV3LargeFeatures(nn.Module):
    """mobilenetv3_large_100 features_only: [16, 24, 40, 112, 960]."""

    in_ch: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(16, (3, 3), strides=(2, 2), use_bias=False,
                    padding=((1, 1), (1, 1)), name="conv_stem")(x)
        h = _BN(eps=1e-5, name="bn_stem")(h, train)
        h = _hardswish(h)
        feats = []
        for si, stage in enumerate(_MNV3L_STAGES):
            for bi, (k, exp_ch, out_ch, se, act, stride) in enumerate(stage):
                se_red = _make_divisible(exp_ch // 4) if se else None
                h = MBConv(
                    out_ch=out_ch,
                    kernel=k,
                    stride=stride,
                    expand=0,
                    expand_ch=exp_ch,
                    se_reduced=se_red,
                    act=act,
                    se_gate="hardsigmoid",
                    se_act="relu",
                    torch_pad=True,
                    bn_eps=1e-5,
                    name=f"blocks_{si}_{bi}",
                )(h, train)
                # tap the feature BEFORE downsampling stages like timm does:
            if si in (0, 1, 2, 3):
                feats.append(h)
        h = nn.Conv(960, (1, 1), use_bias=False, name="conv_head")(h)
        h = _BN(eps=1e-5, name="bn_head")(h, train)
        h = _hardswish(h)
        feats.append(h)
        # channels: [16, 24, 40, 112, 960] at /2 /4 /8 /16 /32
        return feats


def _lazy_specs():
    from patchrefinerv2_tpu.models.backbones.convnext import ConvNeXtFeatures
    from patchrefinerv2_tpu.models.backbones.mobilenetv4 import MobileNetV4Features
    import functools

    imagenet = dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))
    return {
        "convnext_large": dict(
            cls=functools.partial(ConvNeXtFeatures, v2=False),
            channels=[192, 384, 768, 1536],
            **imagenet,
        ),
        "convnextv2_large": dict(
            cls=functools.partial(ConvNeXtFeatures, v2=True),
            channels=[192, 384, 768, 1536],
            **imagenet,
        ),
        "convnextv2_large.fcmae_ft_in22k_in1k_384": dict(
            cls=functools.partial(ConvNeXtFeatures, v2=True),
            channels=[192, 384, 768, 1536],
            **imagenet,
        ),
        "mobilenetv4_conv_small.e2400_r224_in1k": dict(
            cls=functools.partial(MobileNetV4Features, variant="small"),
            channels=[32, 32, 64, 96, 960],
            mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5),
        ),
        "mobilenetv4_conv_medium.e500_r256_in1k": dict(
            cls=functools.partial(MobileNetV4Features, variant="medium"),
            channels=[32, 48, 80, 160, 960],
            mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5),
        ),
        "mobilenetv4_conv_large.e600_r384_in1k": dict(
            cls=functools.partial(MobileNetV4Features, variant="large"),
            channels=[24, 48, 96, 192, 960],
            mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5),
        ),
    }


class _EncoderSpecs(dict):
    """Encoder table with lazy registration of the heavier families."""

    def __missing__(self, key):
        extras = _lazy_specs()
        self.update(extras)
        if key in self:
            return self[key]
        raise NotImplementedError(
            f"encoder {key!r} not implemented; available: {sorted(set(self) | set(extras))}"
        )


ENCODER_SPECS = _EncoderSpecs(
    {
        "tf_efficientnet_b5_ap": dict(
            cls=EfficientNetB5Features,
            channels=[24, 40, 64, 176, 512],
            mean=(0.5, 0.5, 0.5),
            std=(0.5, 0.5, 0.5),
        ),
        "mobilenetv3_large_100": dict(
            cls=MobileNetV3LargeFeatures,
            channels=[16, 24, 40, 112, 960],
            mean=(0.485, 0.456, 0.406),
            std=(0.229, 0.224, 0.225),
        ),
    }
)


def build_encoder(name: str, in_ch: int = 3):
    spec = ENCODER_SPECS[name]
    return spec["cls"](in_ch=in_ch), spec
