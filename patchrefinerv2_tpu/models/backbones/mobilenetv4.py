"""MobileNetV4-Conv feature encoders (timm ``mobilenetv4_conv_small/medium/
large`` equivalents for the refiner; stem patched to 4ch like
patchrefinerplus.py:159-179).

Block semantics follow timm's efficientnet-builder modules exactly:

* ``cn``  — ConvBnAct: conv -> BN -> ReLU.
* ``er``  — EdgeResidual (fused IB): kxk expand conv -> BN -> ReLU ->
  1x1 project conv -> BN, residual when stride 1 and channels match.
* ``uib`` — UniversalInvertedResidual: [dw_start (no act)] -> pw expand
  (act) -> [dw_mid (act)] -> pw project (no act), residual under the same
  condition. The stride sits on ``dw_mid`` when present, else on
  ``dw_start`` (timm's dw_start_stride/dw_mid_stride split).

Feature taps at /2 (stem), /4, /8, /16 stage ends, plus the 960-ch 1x1
conv head at /32, matching timm ``features_only`` channels: small
[32, 32, 64, 96, 960], medium [32, 48, 80, 160, 960], large
[24, 48, 96, 192, 960] (confirmed by the reference fine_chl configs,
configs/patchrefinerv2_zoedepth/v2_mobile_u4k.py:101 and the ablation
variants).

ZERO-EGRESS CAVEAT: the per-stage block rows in ``_MNV4_SPECS`` are a
best-effort transcription of timm's ``_gen_mobilenet_v4`` arch defs from
memory (timm is not installed and unreachable). The stage *tap channels*
are pinned by the reference configs; the internal rows may drift from
timm. The checkpoint converter (utils/torch_convert.convert_timm_mnv4)
therefore DERIVES the spec from the torch state dict itself (block kinds
from key presence, kernels/channels/expansion from weight shapes, strides
from stage position) and the derived spec can be passed back in via the
``spec`` field — a real timm checkpoint always loads into a structurally
matching module even if the defaults here are wrong.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from patchrefinerv2_tpu.models.backbones.encoders import _BN


class ConvBN(nn.Module):
    """timm ConvBnAct: conv.weight / bn1.*"""

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
        return nn.relu(h) if self.act else h


class EdgeResidual(nn.Module):
    """timm EdgeResidual (fused-IB): conv_exp/bn1 -> conv_pwl/bn2."""

    out_ch: int
    expand: float
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand)
        k2 = self.kernel // 2
        h = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            use_bias=False, padding=((k2, k2), (k2, k2)), name="conv_exp",
        )(x)
        h = nn.relu(_BN(eps=1e-5, name="bn1")(h, train))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pwl")(h)
        h = _BN(eps=1e-5, name="bn2")(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class UIB(nn.Module):
    """timm UniversalInvertedResidual: dw_start/pw_exp/dw_mid/pw_proj
    (each a ConvNormAct with conv + bn children)."""

    out_ch: int
    expand: float
    stride: int = 1
    dw_start: int = 0  # kernel size, 0 = absent
    dw_mid: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand)
        start_stride = self.stride if not self.dw_mid else 1
        h = x
        if self.dw_start:
            ks = self.dw_start // 2
            h = nn.Conv(
                in_ch, (self.dw_start, self.dw_start),
                strides=(start_stride, start_stride), feature_group_count=in_ch,
                use_bias=False, padding=((ks, ks), (ks, ks)), name="dw_start",
            )(h)
            h = _BN(eps=1e-5, name="bn_s")(h, train)
        h = nn.Conv(mid, (1, 1), use_bias=False, name="pw_exp")(h)
        h = nn.relu(_BN(eps=1e-5, name="bn_e")(h, train))
        if self.dw_mid:
            km = self.dw_mid // 2
            h = nn.Conv(
                mid, (self.dw_mid, self.dw_mid), strides=(self.stride, self.stride),
                feature_group_count=mid, use_bias=False,
                padding=((km, km), (km, km)), name="dw_mid",
            )(h)
            h = nn.relu(_BN(eps=1e-5, name="bn_m")(h, train))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="pw_proj")(h)
        h = _BN(eps=1e-5, name="bn_p")(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


# stage rows: (kind, out_ch, stride, kernel, expand, dw_start, dw_mid, repeats)
# kind: "cn" ConvBnAct | "er" EdgeResidual | "uib" UniversalInvertedResidual
# (kernel only read for cn/er; dw_start/dw_mid only for uib)
_MNV4_SPECS = {
    "small": dict(
        stem=32,
        stages=[
            [("cn", 32, 2, 3, 0, 0, 0, 1), ("cn", 32, 1, 1, 0, 0, 0, 1)],
            [("cn", 96, 2, 3, 0, 0, 0, 1), ("cn", 64, 1, 1, 0, 0, 0, 1)],
            [
                ("uib", 96, 2, 0, 3.0, 5, 5, 1),
                ("uib", 96, 1, 0, 2.0, 0, 3, 4),
                ("uib", 96, 1, 0, 4.0, 3, 0, 1),
            ],
            [
                ("uib", 128, 2, 0, 6.0, 3, 3, 1),
                ("uib", 128, 1, 0, 4.0, 5, 5, 1),
                ("uib", 128, 1, 0, 4.0, 0, 5, 1),
                ("uib", 128, 1, 0, 3.0, 0, 5, 1),
                ("uib", 128, 1, 0, 4.0, 0, 3, 2),
            ],
        ],
        head=960,
    ),
    "medium": dict(
        stem=32,
        stages=[
            [("er", 48, 2, 3, 4.0, 0, 0, 1)],
            [("uib", 80, 2, 0, 4.0, 3, 5, 1), ("uib", 80, 1, 0, 2.0, 3, 3, 1)],
            [
                ("uib", 160, 2, 0, 6.0, 3, 5, 1),
                ("uib", 160, 1, 0, 4.0, 3, 3, 2),
                ("uib", 160, 1, 0, 4.0, 3, 5, 1),
                ("uib", 160, 1, 0, 4.0, 3, 3, 1),
                ("uib", 160, 1, 0, 4.0, 3, 0, 1),
                ("uib", 160, 1, 0, 2.0, 0, 0, 1),
                ("uib", 160, 1, 0, 4.0, 3, 0, 1),
            ],
            [
                ("uib", 256, 2, 0, 6.0, 5, 5, 1),
                ("uib", 256, 1, 0, 4.0, 5, 5, 1),
                ("uib", 256, 1, 0, 4.0, 3, 5, 2),
                ("uib", 256, 1, 0, 4.0, 0, 0, 1),
                ("uib", 256, 1, 0, 4.0, 3, 0, 1),
                ("uib", 256, 1, 0, 2.0, 3, 5, 1),
                ("uib", 256, 1, 0, 4.0, 5, 5, 1),
                ("uib", 256, 1, 0, 4.0, 0, 0, 2),
                ("uib", 256, 1, 0, 2.0, 5, 0, 1),
            ],
        ],
        head=960,
    ),
    "large": dict(
        stem=24,
        stages=[
            [("er", 48, 2, 3, 4.0, 0, 0, 1)],
            [("uib", 96, 2, 0, 4.0, 3, 5, 1), ("uib", 96, 1, 0, 4.0, 3, 3, 1)],
            [
                ("uib", 192, 2, 0, 4.0, 3, 5, 1),
                ("uib", 192, 1, 0, 4.0, 3, 3, 3),
                ("uib", 192, 1, 0, 4.0, 3, 5, 1),
                ("uib", 192, 1, 0, 4.0, 5, 3, 5),
                ("uib", 192, 1, 0, 4.0, 3, 0, 1),
            ],
            [
                ("uib", 512, 2, 0, 4.0, 5, 5, 1),
                ("uib", 512, 1, 0, 4.0, 5, 5, 3),
                ("uib", 512, 1, 0, 4.0, 5, 0, 1),
                ("uib", 512, 1, 0, 4.0, 5, 3, 1),
                ("uib", 512, 1, 0, 4.0, 5, 0, 2),
                ("uib", 512, 1, 0, 4.0, 5, 3, 1),
                ("uib", 512, 1, 0, 4.0, 5, 5, 1),
                ("uib", 512, 1, 0, 4.0, 5, 0, 3),
            ],
        ],
        head=960,
    ),
}


def unroll_spec(spec: dict) -> dict:
    """Expand repeats into one row per block (repeats=1), preserving the
    stride-on-first-block-of-each-STAGE rule (matching timm, where the
    decoded arch applies the row stride only to the row's first block and
    every mnv4 stage opens with its only stride-2 row)."""
    stages = []
    for stage in spec["stages"]:
        rows = []
        for ri, (kind, out_ch, stride, kernel, expand, dws, dwm, repeats) in enumerate(stage):
            for r in range(repeats):
                s = stride if r == 0 else 1
                rows.append((kind, out_ch, s, kernel, expand, dws, dwm, 1))
        stages.append(rows)
    return dict(stem=spec["stem"], stages=stages, head=spec["head"])


class MobileNetV4Features(nn.Module):
    """5 feature taps: stem(/2), 3 intermediate stage ends (/4 /8 /16), and
    the conv head at /32. ``spec`` (same structure as ``_MNV4_SPECS``
    entries, e.g. derived from a checkpoint by convert_timm_mnv4)
    overrides the built-in ``variant`` layout."""

    variant: str = "small"
    in_ch: int = 3
    spec: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = unroll_spec(self.spec if self.spec is not None else _MNV4_SPECS[self.variant])
        h = ConvBN(spec["stem"], 3, 2, name="conv_stem")(x, train)
        feats = [h]  # /2
        for si, stage in enumerate(spec["stages"]):
            for bi, row in enumerate(stage):
                kind, out_ch, s, kernel, expand, dws, dwm, _ = row
                name = f"b{si}_{bi}"
                if kind == "cn":
                    h = ConvBN(out_ch, kernel, s, name=name)(h, train)
                elif kind == "er":
                    h = EdgeResidual(out_ch, expand, kernel, s, name=name)(h, train)
                else:
                    h = UIB(out_ch, expand, s, dws, dwm, name=name)(h, train)
            if si < len(spec["stages"]) - 1:
                feats.append(h)
        h = ConvBN(spec["head"], 1, 1, name="conv_head")(h, train)
        feats.append(h)
        return feats
