"""End-to-end torch parity for the MiDaS DPT_BEiT core THROUGH the
checkpoint converter: a tiny torch model with the torch.hub key schema
(pretrained.model.* BEiT blocks, pretrained.act_postprocess{1..4}
readout/project/resize, scratch.* DPT decoder — the layout
convert_beit_midas consumes) is randomly initialized and its state dict
must convert onto MidasDPTBEiT so both forwards agree. This pins the
flagship coarse branch numerics end to end."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.beit import (
    MidasDPTBEiT,
    _relative_position_index,
)
from patchrefinerv2_tpu.utils.torch_convert import convert_beit_midas

torch.manual_seed(0)

DIM, HEADS, DEPTH = 32, 4, 4
PATCH = 16
H, W = 32, 48  # grid 2x3, S = 7
GH, GW = H // PATCH, W // PATCH
OUT_CH = (8, 12, 16, 20)
FEAT = 16
TAPS = (0, 1, 2, 3)


class TorchBeitBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
        attn = tnn.Module()
        attn.qkv = tnn.Linear(DIM, DIM * 3, bias=False)
        attn.q_bias = tnn.Parameter(torch.randn(DIM))
        attn.v_bias = tnn.Parameter(torch.randn(DIM))
        n_rel = (2 * GH - 1) * (2 * GW - 1) + 3
        attn.relative_position_bias_table = tnn.Parameter(torch.randn(n_rel, HEADS))
        attn.proj = tnn.Linear(DIM, DIM)
        self.attn = attn
        mlp = tnn.Module()
        mlp.fc1 = tnn.Linear(DIM, DIM * 4)
        mlp.fc2 = tnn.Linear(DIM * 4, DIM)
        self.mlp = mlp
        self.gamma_1 = tnn.Parameter(torch.randn(DIM) * 0.1)
        self.gamma_2 = tnn.Parameter(torch.randn(DIM) * 0.1)
        self.register_buffer(
            "rel_index", torch.tensor(_relative_position_index(GH, GW)), persistent=False
        )

    def _attn(self, x):
        b, s, d = x.shape
        hd = d // HEADS
        bias = torch.cat([
            self.attn.q_bias, torch.zeros_like(self.attn.q_bias), self.attn.v_bias
        ])
        qkv = F.linear(x, self.attn.qkv.weight, bias)
        qkv = qkv.reshape(b, s, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q * hd**-0.5) @ k.transpose(-2, -1)
        rel = self.attn.relative_position_bias_table[self.rel_index.view(-1)]
        att = att + rel.view(s, s, -1).permute(2, 0, 1)[None]
        att = att.softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, s, d)
        return self.attn.proj(o)

    def forward(self, x):
        x = x + self.gamma_1 * self._attn(self.norm1(x))
        return x + self.gamma_2 * self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class Readout(tnn.Module):
    def __init__(self):
        super().__init__()
        self.project = tnn.Sequential(tnn.Linear(2 * DIM, DIM), tnn.GELU())

    def forward(self, tok):  # (B, 1+N, D) -> (B, N, D)
        readout = tok[:, 0:1].expand_as(tok[:, 1:])
        return self.project(torch.cat([tok[:, 1:], readout], dim=-1))


class RCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, 1, 1)
        self.conv2 = tnn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


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


class TorchMidasBeit(tnn.Module):
    """torch.hub DPT_BEiT layout: .pretrained.model trunk +
    .pretrained.act_postprocess{1..4} + .scratch decoder."""

    def __init__(self):
        super().__init__()
        model = tnn.Module()
        pe = tnn.Module()
        pe.proj = tnn.Conv2d(3, DIM, PATCH, PATCH)
        model.patch_embed = pe
        model.cls_token = tnn.Parameter(torch.randn(1, 1, DIM))
        model.blocks = tnn.ModuleList([TorchBeitBlock() for _ in range(DEPTH)])
        self.pretrained = tnn.Module()
        self.pretrained.model = model
        resizes = [
            tnn.ConvTranspose2d(OUT_CH[0], OUT_CH[0], 4, 4),
            tnn.ConvTranspose2d(OUT_CH[1], OUT_CH[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(OUT_CH[3], OUT_CH[3], 3, 2, 1),
        ]
        for i in range(4):
            setattr(
                self.pretrained, f"act_postprocess{i+1}",
                tnn.Sequential(
                    Readout(), tnn.Identity(), tnn.Identity(),
                    tnn.Conv2d(DIM, OUT_CH[i], 1), resizes[i],
                ),
            )
        self.scratch = tnn.Module()
        for i, c in enumerate(OUT_CH):
            setattr(self.scratch, f"layer{i+1}_rn", tnn.Conv2d(c, FEAT, 3, 1, 1, bias=False))
        for k in range(1, 5):
            setattr(self.scratch, f"refinenet{k}", FFB(FEAT))
        self.scratch.output_conv = tnn.Sequential(
            tnn.Conv2d(FEAT, FEAT // 2, 3, 1, 1),
            tnn.Identity(),  # Interpolate in MiDaS
            tnn.Conv2d(FEAT // 2, 32, 3, 1, 1),
            tnn.ReLU(True),
            tnn.Conv2d(32, 1, 1),
            tnn.ReLU(True),
        )

    def forward(self, x):
        x = (x - 0.5) / 0.5
        m = self.pretrained.model
        tok = m.patch_embed.proj(x).flatten(2).transpose(1, 2)
        tok = torch.cat([m.cls_token.expand(tok.shape[0], -1, -1), tok], dim=1)
        taps = []
        for i, blk in enumerate(m.blocks):
            tok = blk(tok)
            if i in TAPS:
                taps.append(tok)
        levels = []
        for i, t in enumerate(taps):
            ap = getattr(self.pretrained, f"act_postprocess{i+1}")
            h = ap[0](t)  # readout -> (B, N, D)
            h = h.transpose(1, 2).reshape(h.shape[0], DIM, GH, GW)
            h = ap[3](h)
            h = ap[4](h)
            levels.append(h)
        l1, l2, l3, l4 = levels
        l1rn = self.scratch.layer1_rn(l1)
        l2rn = self.scratch.layer2_rn(l2)
        l3rn = self.scratch.layer3_rn(l3)
        l4rn = self.scratch.layer4_rn(l4)
        r4 = self.scratch.refinenet4(l4rn, size=l3rn.shape[2:])
        r3 = self.scratch.refinenet3(r4, l3rn, size=l2rn.shape[2:])
        r2 = self.scratch.refinenet2(r3, l2rn, size=l1rn.shape[2:])
        r1 = self.scratch.refinenet1(r2, l1rn)
        h = self.scratch.output_conv[0](r1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
        out_conv = F.relu(self.scratch.output_conv[2](h))
        rel = F.relu(self.scratch.output_conv[4](out_conv))
        return rel, [out_conv, l4rn, r4, r3, r2, r1]


def test_beit_midas_through_converter_matches_torch():
    tm = TorchMidasBeit().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_beit_midas(sd, prefix="")

    rng = np.random.RandomState(0)
    x = rng.rand(1, H, W, 3).astype(np.float32)
    with torch.no_grad():
        ref_rel, ref_pyr = tm(torch.tensor(x.transpose(0, 3, 1, 2)))

    mod = MidasDPTBEiT(
        features=FEAT, out_channels=OUT_CH,
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, taps=TAPS,
    )
    got_rel, got_pyr = mod.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(got_rel), ref_rel.numpy().transpose(0, 2, 3, 1),
        atol=5e-4, rtol=1e-3,
    )
    for i, (g, r) in enumerate(zip(got_pyr, ref_pyr)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=f"pyramid {i}",
        )
