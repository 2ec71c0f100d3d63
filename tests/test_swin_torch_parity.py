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


def test_g2l_fusion_matches_reference_transcription():
    """G2LFusion wrapper (swin_layers.py:360-431): absolute pos embed add,
    depth swin blocks (alternating shift ws//2), final LayerNorm. Window
    attention itself is verified above; this pins the wrapper chain
    (window partition/reverse, padding, shift masks) numerically."""
    import torch.nn.functional as Ft
    from patchrefinerv2_tpu.models.blocks.swin import G2LFusion, _shift_attn_mask

    h, w = 7, 9  # ragged -> exercises window padding
    mod = G2LFusion(
        input_dim=DIM, embed_dim=DIM, window_size=WS, num_heads=HEADS,
        depth=2, num_patches=h * w,
    )
    rng = np.random.RandomState(1)
    x = rng.randn(1, h, w, DIM).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    P = variables["params"]
    got = mod.apply(variables, jnp.asarray(x))

    def window_partition(t, ws):  # torch NHWC (1, H, W, C)
        B, H, W, C = t.shape
        t = t.view(B, H // ws, ws, W // ws, ws, C)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

    def window_reverse(wins, ws, B, H, W, C):
        t = wins.view(B, H // ws, W // ws, ws, ws, C)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)

    with torch.no_grad():
        t = torch.tensor(x)
        ape = torch.tensor(np.asarray(P["absolute_pos_embed"])).view(1, h, w, DIM)
        t = t + ape
        for i in range(2):
            BP = P[f"block{i}"]
            shift = 0 if i % 2 == 0 else WS // 2
            shortcut = t
            y = Ft.layer_norm(
                t, (DIM,),
                torch.tensor(np.asarray(BP["norm1"]["scale"])),
                torch.tensor(np.asarray(BP["norm1"]["bias"])),
            )
            pad_b = (WS - h % WS) % WS
            pad_r = (WS - w % WS) % WS
            y = Ft.pad(y, (0, 0, 0, pad_r, 0, pad_b))
            hp, wp = h + pad_b, w + pad_r
            if shift:
                y = torch.roll(y, (-shift, -shift), dims=(1, 2))
                mask = np.asarray(_shift_attn_mask(hp, wp, WS, shift))
            else:
                mask = None
            wins = window_partition(y, WS)
            wins = t_window_attention(BP["attn"], wins, mask)
            y = window_reverse(wins, WS, 1, hp, wp, DIM)
            if shift:
                y = torch.roll(y, (shift, shift), dims=(1, 2))
            y = y[:, :h, :w]
            t = shortcut + y
            z = Ft.layer_norm(
                t, (DIM,),
                torch.tensor(np.asarray(BP["norm2"]["scale"])),
                torch.tensor(np.asarray(BP["norm2"]["bias"])),
            )
            z = Ft.linear(
                z, torch.tensor(np.asarray(BP["fc1"]["kernel"]).T),
                torch.tensor(np.asarray(BP["fc1"]["bias"])),
            )
            z = Ft.gelu(z)
            z = Ft.linear(
                z, torch.tensor(np.asarray(BP["fc2"]["kernel"]).T),
                torch.tensor(np.asarray(BP["fc2"]["bias"])),
            )
            t = t + z
        t = Ft.layer_norm(
            t, (DIM,),
            torch.tensor(np.asarray(P["g2l_layer_norm"]["scale"])),
            torch.tensor(np.asarray(P["g2l_layer_norm"]["bias"])),
        )
    np.testing.assert_allclose(np.asarray(got), t.numpy(), atol=2e-4, rtol=1e-3)
