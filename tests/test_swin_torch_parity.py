"""Torch-transcription parity for the G2L swin WindowAttention
(reference estimator/models/blocks/swin_layers.py:85-171: qkv with bias,
relative-position-bias table gather over the in-window index, optional
shifted-window additive mask)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.models.blocks.swin import WindowAttention, _rel_pos_index

DIM, HEADS, WS = 32, 4, 3


def t_window_attention(P, x, mask=None):
    Bw, N, C = x.shape
    hd = C // HEADS
    qkv = F.linear(
        x,
        torch.tensor(np.asarray(P["qkv"]["kernel"]).T),
        torch.tensor(np.asarray(P["qkv"]["bias"])),
    )
    qkv = qkv.reshape(Bw, N, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)

    table = torch.tensor(np.asarray(P["relative_position_bias_table"]))
    idx = torch.tensor(_rel_pos_index(WS, WS))
    bias = table[idx.view(-1)].view(WS * WS, WS * WS, -1).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(Bw // nw, nw, HEADS, N, N) + torch.tensor(mask)[None, :, None]
        attn = attn.view(Bw, HEADS, N, N)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(Bw, N, C)
    return F.linear(
        out,
        torch.tensor(np.asarray(P["proj"]["kernel"]).T),
        torch.tensor(np.asarray(P["proj"]["bias"])),
    )


def test_window_attention_matches_reference_transcription():
    rng = np.random.RandomState(0)
    n = WS * WS
    x = rng.randn(4, n, DIM).astype(np.float32)  # 2 windows x batch 2

    mod = WindowAttention(DIM, WS, HEADS)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize the bias table (init is small-normal; make it non-trivial)
    P = jax.tree_util.tree_map(lambda a: a, variables["params"])
    P["relative_position_bias_table"] = jnp.asarray(
        rng.randn((2 * WS - 1) ** 2, HEADS).astype(np.float32)
    )
    variables = {"params": P}

    got = mod.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = t_window_attention(P, torch.tensor(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4, rtol=1e-3)

    # shifted-window additive mask path (2 windows)
    mask = np.zeros((2, n, n), np.float32)
    mask[1, : n // 2, n // 2 :] = -100.0
    mask[1, n // 2 :, : n // 2] = -100.0
    got_m = mod.apply(variables, jnp.asarray(x), jnp.asarray(mask))
    with torch.no_grad():
        ref_m = t_window_attention(P, torch.tensor(x), mask)
    np.testing.assert_allclose(np.asarray(got_m), ref_m.numpy(), atol=2e-4, rtol=1e-3)
