"""End-to-end torch parity for the DA2 DPTHead THROUGH the checkpoint
converter: a torch module with the reference names/semantics
(external/depth_anything_v2/dpt.py:38-150) is randomly initialized, its
state dict flows through convert_da2_head, and the flax DPTHead forward
must reproduce the torch forward (incl. the torch-padded stride-2
resize3 and the sigmoid head)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.dpt import DPTHead
from patchrefinerv2_tpu.utils.torch_convert import convert_da2_head

torch.manual_seed(0)

DIM = 24  # token dim
FEAT = 16
OUT_CH = (8, 12, 16, 20)
PH, PW = 6, 8


class RCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, 1, 1)
        self.conv2 = tnn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class FFB(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = RCU(f)
        self.resConfUnit2 = RCU(f)
        self.out_conv = tnn.Conv2d(f, f, 1)

    def forward(self, *xs, size=None):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        mod = {"scale_factor": 2} if size is None else {"size": size}
        out = F.interpolate(out, **mod, mode="bilinear", align_corners=True)
        return self.out_conv(out)


class TorchDA2Head(tnn.Module):
    def __init__(self):
        super().__init__()
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(DIM, c, 1) for c in OUT_CH]
        )
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(OUT_CH[0], OUT_CH[0], 4, 4),
            tnn.ConvTranspose2d(OUT_CH[1], OUT_CH[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(OUT_CH[3], OUT_CH[3], 3, 2, 1),
        ])
        self.scratch = tnn.Module()
        for i, c in enumerate(OUT_CH):
            setattr(self.scratch, f"layer{i+1}_rn", tnn.Conv2d(c, FEAT, 3, 1, 1, bias=False))
        for k in range(1, 5):
            setattr(self.scratch, f"refinenet{k}", FFB(FEAT))
        self.scratch.output_conv1 = tnn.Conv2d(FEAT, FEAT // 2, 3, 1, 1)
        self.scratch.output_conv2 = tnn.Sequential(
            tnn.Conv2d(FEAT // 2, 32, 3, 1, 1),
            tnn.ReLU(True),
            tnn.Conv2d(32, 1, 1),
            tnn.Sigmoid(),
        )

    def forward(self, tokens_list):
        out = []
        for i, x in enumerate(tokens_list):
            x = x.permute(0, 2, 1).reshape(x.shape[0], x.shape[-1], PH, PW)
            x = self.projects[i](x)
            x = self.resize_layers[i](x)
            out.append(x)
        l1, l2, l3, l4 = out
        l1rn = self.scratch.layer1_rn(l1)
        l2rn = self.scratch.layer2_rn(l2)
        l3rn = self.scratch.layer3_rn(l3)
        l4rn = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(l4rn, size=l3rn.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3rn, size=l2rn.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2rn, size=l1rn.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1rn)
        o = self.scratch.output_conv1(p1)
        out_feat = F.interpolate(o, (PH * 14, PW * 14), mode="bilinear", align_corners=True)
        o = self.scratch.output_conv2(out_feat)
        return o, [l4rn, p4, p3, p2, p1, out_feat]


def test_da2_head_through_converter_matches_torch():
    tm = TorchDA2Head().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_da2_head(sd, prefix="")

    rng = np.random.RandomState(0)
    tokens = [rng.randn(1, PH * PW, DIM).astype(np.float32) for _ in range(4)]
    with torch.no_grad():
        ref_out, ref_feats = tm([torch.tensor(t) for t in tokens])

    head = DPTHead(in_grid=(PH, PW), features=FEAT, out_channels=OUT_CH)
    taps = [(jnp.asarray(t), None) for t in tokens]
    got_out, got_feats = head.apply({"params": params}, taps)

    np.testing.assert_allclose(
        np.asarray(got_out), ref_out.numpy().transpose(0, 2, 3, 1),
        atol=2e-4, rtol=1e-3,
    )
    for i, (g, r) in enumerate(zip(got_feats, ref_feats)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3, err_msg=f"feat {i}",
        )
