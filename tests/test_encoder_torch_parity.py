"""Numeric torch-parity for the refiner encoders + their converters.

Zero-egress substitute for validating against real timm weights: a
minimal torch reimplementation of the timm module layout (same state-dict
key names, same padding/activation/SE semantics) is built here, random
weights flow through ``convert_timm_mbnet`` into the flax encoders, and
the forward feature pyramids must match. This validates the converter key
maps AND the architectures (incl. the torch-vs-TF stride-2 padding split:
mobilenetv3/v4 pad k//2 symmetric, tf_efficientnet uses asymmetric SAME).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.encoders import (
    EfficientNetB5Features,
    MobileNetV3LargeFeatures,
    _make_divisible,
)
from patchrefinerv2_tpu.utils.torch_convert import convert_timm_mbnet

torch.manual_seed(0)



from tests._torch_encoders import (  # noqa: E402
    _B5_STAGES,
    _bn_tf,
    _conv,
    _hardsigmoid,
    _randomize_bn,
    Conv2dSame,
    ConvBnAct,
    DSConv,
    InvertedResidual,
    TorchEffB5,
    TorchMNV3Large,
    TorchSE,
)




def _parity(torch_model, flax_model, h=64, w=96, atol=2e-4):
    torch_model.eval()
    _randomize_bn(torch_model)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    tree = convert_timm_mbnet(sd)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    rng = np.random.RandomState(3)
    x = rng.rand(2, h, w, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.tensor(x.transpose(0, 3, 1, 2)))
    got = flax_model.apply(variables, jnp.asarray(x), False)
    assert len(ref) == len(got)
    for i, (r, g) in enumerate(zip(ref, got)):
        r = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(g), r, atol=atol, rtol=1e-3,
            err_msg=f"feature level {i}",
        )


def test_mobilenetv3_matches_torch():
    _parity(TorchMNV3Large(), MobileNetV3LargeFeatures())


def test_efficientnet_b5_matches_torch():
    _parity(TorchEffB5(), EfficientNetB5Features(), atol=5e-4)


class TorchConvNeXtBlock(tnn.Module):
    def __init__(self, dim, v2):
        super().__init__()
        self.conv_dw = tnn.Conv2d(dim, dim, 7, 1, 3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.v2 = v2
        if v2:
            self.mlp.grn = tnn.Module()
            self.mlp.grn.weight = tnn.Parameter(torch.randn(dim * 4))
            self.mlp.grn.bias = tnn.Parameter(torch.randn(dim * 4))
        else:
            self.gamma = tnn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # NCHW
        h = self.conv_dw(x)
        h = h.permute(0, 2, 3, 1)  # NHWC
        h = self.norm(h)
        h = F.gelu(self.mlp.fc1(h))
        if self.v2:
            gx = torch.sqrt((h**2).sum(dim=(1, 2), keepdim=True) + 1e-12)
            nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
            h = self.mlp.grn.weight * (h * nx) + self.mlp.grn.bias + h
        h = self.mlp.fc2(h)
        if not self.v2:
            h = self.gamma * h
        return x + h.permute(0, 3, 1, 2)


class TorchConvNeXt(tnn.Module):
    """timm convnext(v2) features_only layout (stages/downsample/stem keys)."""

    def __init__(self, depths=(2, 2, 4, 2), dims=(32, 64, 128, 256), v2=True):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, dims[0], 4, 4),
            tnn.LayerNorm([dims[0]], eps=1e-6),  # applied channels-last below
        )
        self.stages = tnn.ModuleList()
        prev = dims[0]
        for s, (d, dim) in enumerate(zip(depths, dims)):
            stage = tnn.Module()
            if s > 0:
                stage.downsample = tnn.Sequential(
                    tnn.LayerNorm([prev], eps=1e-6),
                    tnn.Conv2d(prev, dim, 2, 2),
                )
            stage.blocks = tnn.ModuleList(
                [TorchConvNeXtBlock(dim, v2) for _ in range(d)]
            )
            self.stages.append(stage)
            prev = dim

    @staticmethod
    def _ln(ln, x):  # x NCHW -> LN over channels -> NCHW
        h = x.permute(0, 2, 3, 1)
        h = ln(h)
        return h.permute(0, 3, 1, 2)

    def forward(self, x):
        h = self.stem[0](x)
        h = self._ln(self.stem[1], h)
        feats = []
        for s, stage in enumerate(self.stages):
            if s > 0:
                h = self._ln(stage.downsample[0], h)
                h = stage.downsample[1](h)
            for b in stage.blocks:
                h = b(h)
            feats.append(h)
        return feats


@pytest.mark.parametrize("v2", [True, False])
def test_convnext_matches_torch(v2):
    from patchrefinerv2_tpu.models.backbones.convnext import ConvNeXtFeatures
    from patchrefinerv2_tpu.utils.torch_convert import convert_timm_convnext

    tm = TorchConvNeXt(v2=v2)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_timm_convnext(sd, v2=v2)
    fm = ConvNeXtFeatures(depths=(2, 2, 4, 2), dims=(32, 64, 128, 256), v2=v2)

    rng = np.random.RandomState(5)
    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    got = fm.apply({"params": tree["params"]}, jnp.asarray(x), False)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=f"level {i}",
        )
