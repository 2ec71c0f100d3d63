"""Numeric torch-parity for the transformer backbone blocks.

Torch reimplementations of the timm BEiT block (q/zero-k/v bias,
relative-position-bias table gather, LayerScale) and the DINOv2 block
(qkv bias, LayerScale, exact-erf GELU) are run against the flax modules
with weights mapped through the same layout converters the checkpoint
converter uses. This pins the attention/bias numerics of the coarse
branch (the <=1e-3 rel-depth parity budget lives or dies here)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.backbones.beit import (
    BeitBlock,
    _relative_position_index,
)
from patchrefinerv2_tpu.models.backbones.vit import Block as DinoBlock
from patchrefinerv2_tpu.utils.torch_convert import t2f_linear

torch.manual_seed(0)


class TorchBeitBlock(tnn.Module):
    """timm beit.Block semantics (the torch.hub MiDaS BEiT-L trunk)."""

    def __init__(self, dim, heads, grid):
        super().__init__()
        gh, gw = grid
        self.dim, self.heads, self.grid = dim, heads, grid
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.q_bias = tnn.Parameter(torch.randn(dim))
        self.v_bias = tnn.Parameter(torch.randn(dim))
        n_rel = (2 * gh - 1) * (2 * gw - 1) + 3
        self.rel_table = tnn.Parameter(torch.randn(n_rel, heads))
        self.proj = tnn.Linear(dim, dim)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.gamma_1 = tnn.Parameter(torch.randn(dim))
        self.gamma_2 = tnn.Parameter(torch.randn(dim))
        idx = _relative_position_index(gh, gw)
        self.register_buffer("rel_index", torch.tensor(idx))

    def attn(self, x):
        b, s, d = x.shape
        hd = d // self.heads
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias), self.v_bias])
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(b, s, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q * hd**-0.5) @ k.transpose(-2, -1)
        rel = self.rel_table[self.rel_index.reshape(-1)].reshape(s, s, -1)
        att = att + rel.permute(2, 0, 1)[None]
        att = att.softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, s, d)
        return self.proj(o)

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        return x + self.gamma_2 * self.fc2(F.gelu(self.fc1(self.norm2(x))))


def test_beit_block_matches_torch():
    dim, heads, grid = 64, 4, (4, 6)
    tm = TorchBeitBlock(dim, heads, grid).eval()

    params = {
        "gamma_1": tm.gamma_1.detach().numpy(),
        "gamma_2": tm.gamma_2.detach().numpy(),
        "norm1": {"scale": tm.norm1.weight.detach().numpy(),
                  "bias": tm.norm1.bias.detach().numpy()},
        "norm2": {"scale": tm.norm2.weight.detach().numpy(),
                  "bias": tm.norm2.bias.detach().numpy()},
        "attn": {
            "qkv": {"kernel": t2f_linear(tm.qkv.weight.detach().numpy())},
            "q_bias": tm.q_bias.detach().numpy(),
            "v_bias": tm.v_bias.detach().numpy(),
            "relative_position_bias_table": tm.rel_table.detach().numpy(),
            "proj": {"kernel": t2f_linear(tm.proj.weight.detach().numpy()),
                     "bias": tm.proj.bias.detach().numpy()},
        },
        "fc1": {"kernel": t2f_linear(tm.fc1.weight.detach().numpy()),
                "bias": tm.fc1.bias.detach().numpy()},
        "fc2": {"kernel": t2f_linear(tm.fc2.weight.detach().numpy()),
                "bias": tm.fc2.bias.detach().numpy()},
    }

    s = grid[0] * grid[1] + 1
    rng = np.random.RandomState(1)
    x = rng.randn(2, s, dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    blk = BeitBlock(dim, heads, grid)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


class TorchDinoBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        self.ls1 = tnn.Parameter(torch.randn(dim))
        self.ls2 = tnn.Parameter(torch.randn(dim))
        self.heads = heads

    def forward(self, x):
        b, s, d = x.shape
        hd = d // self.heads
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(b, s, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = ((q * hd**-0.5) @ k.transpose(-2, -1)).softmax(-1)
        o = (att @ v).transpose(1, 2).reshape(b, s, d)
        x = x + self.ls1 * self.proj(o)
        h = self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x + self.ls2 * h


def test_dino_block_matches_torch():
    dim, heads = 64, 4
    tm = TorchDinoBlock(dim, heads).eval()
    params = {
        "norm1": {"scale": tm.norm1.weight.detach().numpy(),
                  "bias": tm.norm1.bias.detach().numpy()},
        "norm2": {"scale": tm.norm2.weight.detach().numpy(),
                  "bias": tm.norm2.bias.detach().numpy()},
        "attn": {
            "qkv": {"kernel": t2f_linear(tm.qkv.weight.detach().numpy()),
                    "bias": tm.qkv.bias.detach().numpy()},
            "proj": {"kernel": t2f_linear(tm.proj.weight.detach().numpy()),
                     "bias": tm.proj.bias.detach().numpy()},
        },
        "ls1": {"gamma": tm.ls1.detach().numpy()},
        "ls2": {"gamma": tm.ls2.detach().numpy()},
        "mlp": {
            "fc1": {"kernel": t2f_linear(tm.fc1.weight.detach().numpy()),
                    "bias": tm.fc1.bias.detach().numpy()},
            "fc2": {"kernel": t2f_linear(tm.fc2.weight.detach().numpy()),
                    "bias": tm.fc2.bias.detach().numpy()},
        },
    }
    rng = np.random.RandomState(2)
    x = rng.randn(2, 25, dim).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    blk = DinoBlock(dim, heads)
    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
