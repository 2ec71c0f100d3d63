"""End-to-end torch parity for the DINOv2 trunk THROUGH convert_dino_vit:
a tiny torch trunk with the DINOv2 key schema and semantics
(external/depth_anything_v2/dinov2.py: patch embed, cls+pos tokens with
the interpolate_offset=0.1 bicubic scale-factor quirk :179-210, pre-LN
blocks with LayerScale, get_intermediate_layers norm) converts and must
match the flax DinoViT forward."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.vit import DinoViT
from patchrefinerv2_tpu.utils.torch_convert import convert_dino_vit

torch.manual_seed(0)

DIM, HEADS, DEPTH = 96, 2, 4  # the 'vitt' debug trunk
PATCH = 14
POS_GRID = 37
H, W = 14 * 4, 14 * 6  # grid 4x6 -> exercises the pos-embed interp


class LayerScale(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.randn(dim) * 0.1)

    def forward(self, x):
        return x * self.gamma


class Block(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
        attn = tnn.Module()
        attn.qkv = tnn.Linear(DIM, DIM * 3)
        attn.proj = tnn.Linear(DIM, DIM)
        self.attn = attn
        mlp = tnn.Module()
        mlp.fc1 = tnn.Linear(DIM, DIM * 4)
        mlp.fc2 = tnn.Linear(DIM * 4, DIM)
        self.mlp = mlp
        self.ls1 = LayerScale(DIM)
        self.ls2 = LayerScale(DIM)

    def _attn(self, x):
        b, s, d = x.shape
        hd = d // HEADS
        qkv = self.attn.qkv(x).reshape(b, s, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = ((q * hd**-0.5) @ k.transpose(-2, -1)).softmax(-1)
        return self.attn.proj((att @ v).transpose(1, 2).reshape(b, s, d))

    def forward(self, x):
        x = x + self.ls1(self._attn(self.norm1(x)))
        return x + self.ls2(self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x)))))


class TorchDino(tnn.Module):
    def __init__(self):
        super().__init__()
        pe = tnn.Module()
        pe.proj = tnn.Conv2d(3, DIM, PATCH, PATCH)
        self.patch_embed = pe
        self.cls_token = tnn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, POS_GRID * POS_GRID + 1, DIM) * 0.02
        )
        self.blocks = tnn.ModuleList([Block() for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)

    def interpolate_pos(self, h, w):
        # dinov2.py:179-210 (interpolate_offset=0.1, scale-factor bicubic;
        # the reference unpacks B, nc, w, h = x.shape, so its "sx" is the
        # H-axis factor — torch applies scale_factor[0] to dim -2)
        N = self.pos_embed.shape[1] - 1
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:]
        h0 = h // PATCH + 0.1
        w0 = w // PATCH + 0.1
        sqrt_N = math.sqrt(N)
        patch_pos = F.interpolate(
            patch_pos.reshape(1, int(sqrt_N), int(sqrt_N), DIM).permute(0, 3, 1, 2),
            scale_factor=(float(h0) / sqrt_N, float(w0) / sqrt_N),
            mode="bicubic",
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, -1, DIM)
        return torch.cat([cls_pos, patch_pos], dim=1)

    def forward(self, x, taps):
        tok = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(tok.shape[0], -1, -1), tok], dim=1)
        tok = tok + self.interpolate_pos(x.shape[-2], x.shape[-1])
        outs = []
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if i in taps:
                outs.append(tok)
        return [(self.norm(o)[:, 1:], self.norm(o)[:, 0]) for o in outs]


def test_dinov2_trunk_through_converter_matches_torch():
    tm = TorchDino().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_dino_vit(sd, prefix="")

    rng = np.random.RandomState(0)
    x = rng.rand(1, H, W, 3).astype(np.float32)
    taps = [0, 1, 2, 3]
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)), taps)

    mod = DinoViT(variant="vitt")
    got = mod.apply({"params": params}, jnp.asarray(x), taps=taps)

    assert len(got) == len(ref)
    for i, ((gp, gc), (rp, rc)) in enumerate(zip(got, ref)):
        # pos-embed bicubic interp differs at ~1e-4 (scale-override quirk
        # reproduced; remaining diff is f32 interp accumulation order)
        np.testing.assert_allclose(
            np.asarray(gp), rp.numpy(), atol=2e-3, rtol=1e-2, err_msg=f"patch {i}"
        )
        np.testing.assert_allclose(
            np.asarray(gc), rc.numpy(), atol=2e-3, rtol=1e-2, err_msg=f"cls {i}"
        )
