"""Numeric torch-parity for the MobileNetV4 refiner encoders + converter.

Zero-egress substitute for validating against real timm weights (same
approach as test_encoder_torch_parity.py): a minimal torch
reimplementation of timm's mobilenetv4 module layout — identical
state-dict key names (conv_stem/bn1, blocks.si.bi with
dw_start/pw_exp/dw_mid/pw_proj ConvNormAct children, EdgeResidual
conv_exp/bn1/conv_pwl/bn2, ConvBnAct conv/bn1, single-block 1x1 head
stage) and identical semantics (ReLU, BN eps 1e-5, symmetric k//2
padding, stride on dw_mid when present else dw_start, residual when
stride 1 and channels match, no activation on dw_start/pw_proj) — is
built from the SAME ``_MNV4_SPECS`` rows as the flax module, random
weights flow through ``convert_timm_mnv4``, and the 5-level feature
pyramids must match for small/medium/large, 3-ch and 4-ch stems.

Also pins the converter's spec DERIVATION: the arch spec reconstructed
from the state dict alone (shapes + stage position) must round-trip to
the unrolled source spec — that derivation is what guarantees a real
timm checkpoint builds a structurally matching module even if the
transcribed default specs drift from timm (mobilenetv4.py docstring).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.mobilenetv4 import (
    _MNV4_SPECS,
    MobileNetV4Features,
    unroll_spec,
)
from patchrefinerv2_tpu.utils.torch_convert import convert_timm_mnv4

torch.manual_seed(0)


class ConvNormAct(tnn.Module):
    def __init__(self, cin, cout, k, s=1, groups=1, apply_act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.apply_act = apply_act

    def forward(self, x):
        h = self.bn(self.conv(x))
        return F.relu(h) if self.apply_act else h


class UniversalInvertedResidual(tnn.Module):
    def __init__(self, cin, cout, exp, s, dws, dwm):
        super().__init__()
        mid = int(cin * exp)
        if dws:
            self.dw_start = ConvNormAct(
                cin, cin, dws, s if not dwm else 1, groups=cin, apply_act=False
            )
        self.pw_exp = ConvNormAct(cin, mid, 1)
        if dwm:
            self.dw_mid = ConvNormAct(mid, mid, dwm, s, groups=mid)
        self.pw_proj = ConvNormAct(mid, cout, 1, apply_act=False)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        h = x
        if hasattr(self, "dw_start"):
            h = self.dw_start(h)
        h = self.pw_exp(h)
        if hasattr(self, "dw_mid"):
            h = self.dw_mid(h)
        h = self.pw_proj(h)
        return x + h if self.has_skip else h


class EdgeResidual(tnn.Module):
    def __init__(self, cin, cout, exp, k, s):
        super().__init__()
        mid = int(cin * exp)
        self.conv_exp = tnn.Conv2d(cin, mid, k, s, k // 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        h = F.relu(self.bn1(self.conv_exp(x)))
        h = self.bn2(self.conv_pwl(h))
        return x + h if self.has_skip else h


class ConvBnAct(tnn.Module):
    def __init__(self, cin, cout, k, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn1(self.conv(x)))


class TorchMNV4(tnn.Module):
    """timm mobilenetv4_conv_* features_only layout, built from the same
    spec rows as the flax module."""

    def __init__(self, variant):
        super().__init__()
        spec = unroll_spec(_MNV4_SPECS[variant])
        self.conv_stem = tnn.Conv2d(3, spec["stem"], 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(spec["stem"])
        blocks = tnn.ModuleList()
        cin = spec["stem"]
        for stage in spec["stages"]:
            mods = tnn.ModuleList()
            for kind, out, s, k, exp, dws, dwm, _ in stage:
                if kind == "cn":
                    mods.append(ConvBnAct(cin, out, k, s))
                elif kind == "er":
                    mods.append(EdgeResidual(cin, out, exp, k, s))
                else:
                    mods.append(UniversalInvertedResidual(cin, out, exp, s, dws, dwm))
                cin = out
            blocks.append(mods)
        blocks.append(tnn.ModuleList([ConvBnAct(cin, spec["head"], 1, 1)]))
        self.blocks = blocks

    def forward(self, x):
        h = F.relu(self.bn1(self.conv_stem(x)))
        feats = [h]
        for si, stage in enumerate(self.blocks):
            for b in stage:
                h = b(h)
            if si < len(self.blocks) - 2:
                feats.append(h)
        return feats + [h]


def _randomize_bn(model):
    rng = np.random.RandomState(7)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.randn(m.num_features), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(np.abs(rng.randn(m.num_features)) + 0.5, dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(rng.randn(m.num_features), dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(rng.randn(m.num_features), dtype=torch.float32))


@pytest.mark.parametrize("variant", ["small", "medium", "large"])
@pytest.mark.parametrize("in_ch", [3, 4])
def test_mnv4_matches_torch(variant, in_ch):
    tm = TorchMNV4(variant)
    tm.eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, spec = convert_timm_mnv4(sd, in_ch=in_ch, return_spec=True)

    # spec derivation round-trips from weights alone
    want = unroll_spec(_MNV4_SPECS[variant])
    assert spec["stem"] == want["stem"] and spec["head"] == want["head"]
    assert len(spec["stages"]) == len(want["stages"])
    for ds_, ws in zip(spec["stages"], want["stages"]):
        assert len(ds_) == len(ws)
        for dr, wr in zip(ds_, ws):
            dk, dout, dstr, dker, dexp, ddws, ddwm, _ = dr
            wk, wout, wstr, wker, wexp, wdws, wdwm, _ = wr
            assert (dk, dout, dstr, ddws, ddwm) == (wk, wout, wstr, wdws, wdwm)
            if wk in ("cn", "er"):
                assert dker == wker
            if wk in ("er", "uib"):
                # derived expansion (mid/in from weight shapes) is exact:
                # every mnv4 expansion times its in-channels is integral
                assert abs(dexp - wexp) < 1e-6

    fm = MobileNetV4Features(variant=variant, in_ch=in_ch, spec=spec)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    rng = np.random.RandomState(3)
    x = rng.rand(2, 64, 96, in_ch).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x[..., :3].transpose(0, 3, 1, 2)))
    got = fm.apply(variables, jnp.asarray(x), False)
    assert len(ref) == len(got) == 5
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=3e-4, rtol=1e-3, err_msg=f"{variant} level {i}",
        )


@pytest.mark.parametrize("variant", ["small", "medium", "large"])
def test_mnv4_feature_channels_match_reference_configs(variant):
    """The features_only channel taps are the one piece of timm ground
    truth available offline (reference fine_chl configs,
    v2_mobile_u4k.py:101 / plus_mobile_c2f_noenc.py:101)."""
    want = {
        "small": [32, 32, 64, 96, 960],
        "medium": [32, 48, 80, 160, 960],
        "large": [24, 48, 96, 192, 960],
    }[variant]
    spec = unroll_spec(_MNV4_SPECS[variant])
    got = [spec["stem"]] + [st[-1][1] for st in spec["stages"][:-1]] + [spec["head"]]
    assert got == want
