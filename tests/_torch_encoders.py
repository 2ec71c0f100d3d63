"""Torch reimplementations of the timm encoders (golden references).

Minimal torch modules with timm's module layout, state-dict key names, and
numerics (padding style, SE reduction, BN eps). Used two ways:
- the encoder torch-parity tests pin the flax encoders + converters on them
  (tests/test_encoder_torch_parity.py);
- the reference-composed-parity shims serve them as ``timm.create_model``
  stand-ins so the ACTUAL reference model files (which call
  ``timm.create_model(name, features_only=True)``,
  /root/reference/estimator/models/blocks/lightweight_refiner.py:260) run
  end-to-end without timm in the environment (tests/ref_shims.py).

Zero-egress substitute for real timm weights; weights are random, parity
is architectural + converter key-map exactness.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from patchrefinerv2_tpu.models.backbones.encoders import _make_divisible

def _hardsigmoid(x):
    return F.relu6(x + 3.0) / 6.0


class TorchSE(tnn.Module):
    def __init__(self, ch, red, act, gate):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, red, 1)
        self.conv_expand = tnn.Conv2d(red, ch, 1)
        self.act = act
        self.gate = gate

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.act(self.conv_reduce(s))
        s = self.conv_expand(s)
        return x * self.gate(s)


class Conv2dSame(tnn.Conv2d):
    """TF SAME padding (timm Conv2dSame for tf_ models)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups)


def _conv(cin, cout, k, s, groups=1, tf_same=False):
    if tf_same:
        return Conv2dSame(cin, cout, k, s, 0, groups=groups, bias=False)
    return tnn.Conv2d(cin, cout, k, s, k // 2, groups=groups, bias=False)


class InvertedResidual(tnn.Module):
    def __init__(self, cin, mid, cout, k, s, se_red, act, se_act, se_gate, tf_same):
        super().__init__()
        self.conv_pw = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv_dw = _conv(mid, mid, k, s, groups=mid, tf_same=tf_same)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.se = TorchSE(mid, se_red, se_act, se_gate) if se_red else None
        self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.act = act
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        h = self.act(self.bn1(self.conv_pw(x)))
        h = self.act(self.bn2(self.conv_dw(h)))
        if self.se is not None:
            h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_skip else h


class DSConv(tnn.Module):
    def __init__(self, cin, cout, k, s, se_red, act, se_act, se_gate, tf_same):
        super().__init__()
        self.conv_dw = _conv(cin, cin, k, s, groups=cin, tf_same=tf_same)
        self.bn1 = tnn.BatchNorm2d(cin)
        self.se = TorchSE(cin, se_red, se_act, se_gate) if se_red else None
        self.conv_pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.act = act
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        h = self.act(self.bn1(self.conv_dw(x)))
        if self.se is not None:
            h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_skip else h


class ConvBnAct(tnn.Module):
    def __init__(self, cin, cout, k, act):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, 1, k // 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        return self.act(self.bn1(self.conv(x)))


def _randomize_bn(model):
    rng = np.random.RandomState(7)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.randn(m.num_features), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(np.abs(rng.randn(m.num_features)) + 0.5, dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(rng.randn(m.num_features), dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(rng.randn(m.num_features), dtype=torch.float32))


class TorchMNV3Large(tnn.Module):
    """mobilenetv3_large_100 features_only (timm layout + key names)."""

    def __init__(self):
        super().__init__()
        hs, re = F.hardswish, F.relu
        self.conv_stem = tnn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(16)
        stages = [
            [(3, 16, 16, False, re, 1)],
            [(3, 64, 24, False, re, 2), (3, 72, 24, False, re, 1)],
            [(5, 72, 40, True, re, 2), (5, 120, 40, True, re, 1), (5, 120, 40, True, re, 1)],
            [
                (3, 240, 80, False, hs, 2), (3, 200, 80, False, hs, 1),
                (3, 184, 80, False, hs, 1), (3, 184, 80, False, hs, 1),
                (3, 480, 112, True, hs, 1), (3, 672, 112, True, hs, 1),
            ],
            [(5, 672, 160, True, hs, 2), (5, 960, 160, True, hs, 1), (5, 960, 160, True, hs, 1)],
        ]
        blocks = tnn.ModuleList()
        cin = 16
        for stage in stages:
            mods = tnn.ModuleList()
            for k, exp, out, se, act, s in stage:
                red = _make_divisible(exp // 4) if se else 0
                if exp == cin and cin == out and s == 1 and stage is stages[0]:
                    mods.append(DSConv(cin, out, k, s, red, act, F.relu, _hardsigmoid, False))
                else:
                    mods.append(InvertedResidual(cin, exp, out, k, s, red, act, F.relu, _hardsigmoid, False))
                cin = out
            blocks.append(mods)
        blocks.append(tnn.ModuleList([ConvBnAct(160, 960, 1, hs)]))
        self.blocks = blocks

    def forward(self, x):
        h = F.hardswish(self.bn1(self.conv_stem(x)))
        feats = []
        for si, stage in enumerate(self.blocks):
            for b in stage:
                h = b(h)
            if si in (0, 1, 2, 3):
                feats.append(h)
        return feats + [h]


_B5_STAGES = [
    (3, 1, 1, 24, 3), (3, 2, 6, 40, 5), (5, 2, 6, 64, 5), (3, 2, 6, 128, 7),
    (5, 1, 6, 176, 7), (5, 2, 6, 304, 9), (3, 1, 6, 512, 3),
]


def _bn_tf(ch):
    return tnn.BatchNorm2d(ch, eps=1e-3)


class TorchEffB5(tnn.Module):
    """tf_efficientnet_b5_ap features_only (TF SAME padding, BN eps 1e-3)."""

    def __init__(self):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 48, 3, 2, 0, bias=False)
        self.bn1 = _bn_tf(48)
        blocks = tnn.ModuleList()
        cin = 48
        for k, s, e, out, r in _B5_STAGES:
            mods = tnn.ModuleList()
            for bi in range(r):
                stride = s if bi == 0 else 1
                red = max(1, int(cin * 0.25))
                if e == 1:
                    blk = DSConv(cin, out, k, stride, red, F.silu, F.silu, torch.sigmoid, True)
                    blk.bn1 = _bn_tf(cin); blk.bn2 = _bn_tf(out)
                else:
                    blk = InvertedResidual(cin, cin * e, out, k, stride, red, F.silu, F.silu, torch.sigmoid, True)
                    blk.bn1 = _bn_tf(cin * e); blk.bn2 = _bn_tf(cin * e); blk.bn3 = _bn_tf(out)
                mods.append(blk)
                cin = out
            blocks.append(mods)
        self.blocks = blocks

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_stem(x)))
        feats = []
        for si, stage in enumerate(self.blocks):
            for b in stage:
                h = b(h)
            if si in (0, 1, 2, 4, 6):
                feats.append(h)
        return feats
