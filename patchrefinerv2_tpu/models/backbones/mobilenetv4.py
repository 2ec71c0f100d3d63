"""MobileNetV4-Conv feature encoders (timm 'mobilenetv4_conv_small/medium/
large' equivalents for the refiner; stem patched to 4ch like
patchrefinerplus.py:159-179).

Built from Universal-Inverted-Bottleneck (UIB) blocks: optional depthwise
before expansion, pointwise expand, optional mid depthwise (stride), and
pointwise project; fused-IB in early stages. Stage layouts follow the
MobileNetV4 paper's conv variants; feature taps at /2 /4 /8 /16 plus the
960/1280-ch conv head at /32 matching timm features_only channels:
small [32, 32, 64, 96, 960], medium [32, 48, 80, 160, 960],
large [24, 48, 96, 192, 960].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.encoders import _BN


def _relu(x):
    return nn.relu(x)


class ConvBN(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k2 = self.kernel // 2
        h = nn.Conv(
            self.out_ch, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            use_bias=False, padding=((k2, k2), (k2, k2)), name="conv",
        )(x)
        h = _BN(eps=1e-5, name="bn")(h, train)
        return _relu(h) if self.act else h


class UIB(nn.Module):
    """Universal inverted bottleneck: [dw_start] -> pw expand -> [dw_mid
    (stride)] -> pw project, residual when stride 1 and channels match."""

    out_ch: int
    expand: float
    stride: int = 1
    dw_start: int = 0  # kernel size, 0 = absent
    dw_mid: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand)
        h = x
        if self.dw_start:
            ks = self.dw_start // 2
            h = nn.Conv(
                in_ch, (self.dw_start, self.dw_start), feature_group_count=in_ch,
                use_bias=False, padding=((ks, ks), (ks, ks)), name="dw_start",
            )(h)
            h = _BN(eps=1e-5, name="bn_s")(h, train)
        h = nn.Conv(mid, (1, 1), use_bias=False, name="pw_exp")(h)
        h = _BN(eps=1e-5, name="bn_e")(h, train)
        h = _relu(h)
        if self.dw_mid:
            km = self.dw_mid // 2
            h = nn.Conv(
                mid, (self.dw_mid, self.dw_mid), strides=(self.stride, self.stride),
                feature_group_count=mid, use_bias=False,
                padding=((km, km), (km, km)), name="dw_mid",
            )(h)
            h = _BN(eps=1e-5, name="bn_m")(h, train)
            h = _relu(h)
        elif self.stride > 1:
            h = nn.Conv(
                mid, (3, 3), strides=(self.stride, self.stride),
                feature_group_count=mid, use_bias=False,
                padding=((1, 1), (1, 1)), name="dw_stride",
            )(h)
            h = _BN(eps=1e-5, name="bn_m")(h, train)
            h = _relu(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pw_proj")(h)
        h = _BN(eps=1e-5, name="bn_p")(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


# stage rows: (kind, out_ch, stride, expand, dw_start, dw_mid, repeats)
_MNV4_SPECS = {
    "small": dict(
        stem=32,
        stages=[
            [("cn", 32, 2, 0, 0, 0, 1), ("cn", 32, 1, 0, 0, 0, 1)],
            [("cn", 96, 2, 0, 0, 0, 1), ("cn", 64, 1, 0, 0, 0, 1)],
            [
                ("uib", 96, 2, 3.0, 5, 5, 1),
                ("uib", 96, 1, 2.0, 0, 3, 4),
                ("uib", 96, 1, 4.0, 3, 0, 1),
            ],
            [
                ("uib", 128, 2, 6.0, 3, 3, 1),
                ("uib", 128, 1, 4.0, 5, 5, 1),
                ("uib", 128, 1, 4.0, 0, 5, 2),
                ("uib", 128, 1, 4.0, 0, 3, 2),
            ],
        ],
        head=960,
    ),
    "medium": dict(
        stem=32,
        stages=[
            [("cn", 48, 2, 0, 0, 0, 2)],
            [("uib", 80, 2, 4.0, 3, 5, 1), ("uib", 80, 1, 2.0, 3, 3, 1)],
            [
                ("uib", 160, 2, 6.0, 3, 5, 1),
                ("uib", 160, 1, 4.0, 3, 3, 3),
                ("uib", 160, 1, 4.0, 0, 0, 2),
            ],
            [
                ("uib", 256, 2, 6.0, 5, 5, 1),
                ("uib", 256, 1, 4.0, 5, 5, 2),
                ("uib", 256, 1, 4.0, 0, 0, 3),
            ],
        ],
        head=960,
    ),
    "large": dict(
        stem=24,
        stages=[
            [("cn", 48, 2, 0, 0, 0, 2)],
            [("uib", 96, 2, 4.0, 3, 5, 1), ("uib", 96, 1, 4.0, 3, 3, 1)],
            [
                ("uib", 192, 2, 4.0, 3, 5, 1),
                ("uib", 192, 1, 4.0, 3, 3, 4),
                ("uib", 192, 1, 4.0, 5, 3, 4),
            ],
            [
                ("uib", 512, 2, 4.0, 5, 5, 1),
                ("uib", 512, 1, 4.0, 5, 5, 3),
                ("uib", 512, 1, 4.0, 5, 0, 3),
            ],
        ],
        head=960,
    ),
}


class MobileNetV4Features(nn.Module):
    """5 feature taps: stem(/2), 3 intermediate stage ends (/4 /8 /16), and
    the conv head at /32."""

    variant: str = "small"
    in_ch: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = _MNV4_SPECS[self.variant]
        h = ConvBN(spec["stem"], 3, 2, name="conv_stem")(x, train)
        feats = [h]  # /2
        for si, stage in enumerate(spec["stages"]):
            for ri, row in enumerate(stage):
                kind, out_ch, stride, expand, dws, dwm, repeats = row
                for r in range(repeats):
                    s = stride if r == 0 and ri == 0 else 1
                    name = f"s{si}_r{ri}_{r}"
                    if kind == "cn":
                        h = ConvBN(out_ch, 3, s, name=name)(h, train)
                    else:
                        h = UIB(out_ch, expand, s, dws, dwm, name=name)(h, train)
            if si < len(spec["stages"]) - 1:
                feats.append(h)
        h = ConvBN(spec["head"], 1, 1, name="conv_head")(h, train)
        feats.append(h)
        return feats
