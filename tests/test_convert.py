"""Converter round-trip: synthesize a torch-layout state_dict from a flax
init tree, convert, and check the result grafts cleanly (tree + shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from patchrefinerv2_tpu.models.backbones.vit import DinoViT
from patchrefinerv2_tpu.utils.torch_convert import (
    convert_dino_vit,
    insert_converted,
    t2f_conv,
    t2f_conv_transpose,
    t2f_linear,
)


def _torch_sd_for_vitt(params):
    """Build a torch-convention state_dict whose conversion must reproduce
    the flax tree exactly."""
    sd = {}
    p = params
    sd["pretrained.cls_token"] = np.asarray(p["cls_token"])
    sd["pretrained.pos_embed"] = np.asarray(p["pos_embed"])
    k = np.asarray(p["patch_embed"]["kernel"])  # (kh, kw, I, O)
    sd["pretrained.patch_embed.proj.weight"] = np.transpose(k, (3, 2, 0, 1))
    sd["pretrained.patch_embed.proj.bias"] = np.asarray(p["patch_embed"]["bias"])
    i = 0
    while f"block{i}" in p:
        b = p[f"block{i}"]
        pre = f"pretrained.blocks.{i}."
        sd[pre + "norm1.weight"] = np.asarray(b["norm1"]["scale"])
        sd[pre + "norm1.bias"] = np.asarray(b["norm1"]["bias"])
        sd[pre + "attn.qkv.weight"] = np.asarray(b["attn"]["qkv"]["kernel"]).T
        sd[pre + "attn.qkv.bias"] = np.asarray(b["attn"]["qkv"]["bias"])
        sd[pre + "attn.proj.weight"] = np.asarray(b["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = np.asarray(b["attn"]["proj"]["bias"])
        sd[pre + "ls1.gamma"] = np.asarray(b["ls1"]["gamma"])
        sd[pre + "ls2.gamma"] = np.asarray(b["ls2"]["gamma"])
        sd[pre + "norm2.weight"] = np.asarray(b["norm2"]["scale"])
        sd[pre + "norm2.bias"] = np.asarray(b["norm2"]["bias"])
        sd[pre + "mlp.fc1.weight"] = np.asarray(b["mlp"]["fc1"]["kernel"]).T
        sd[pre + "mlp.fc1.bias"] = np.asarray(b["mlp"]["fc1"]["bias"])
        sd[pre + "mlp.fc2.weight"] = np.asarray(b["mlp"]["fc2"]["kernel"]).T
        sd[pre + "mlp.fc2.bias"] = np.asarray(b["mlp"]["fc2"]["bias"])
        i += 1
    sd["pretrained.norm.weight"] = np.asarray(p["norm"]["scale"])
    sd["pretrained.norm.bias"] = np.asarray(p["norm"]["bias"])
    return sd


def test_dino_vit_convert_roundtrip():
    vit = DinoViT(variant="vitt")
    x = jnp.zeros((1, 28, 28, 3))
    variables = jax.jit(lambda r: vit.init(r, x))(jax.random.PRNGKey(0))
    params = variables["params"]
    sd = _torch_sd_for_vitt(params)
    converted = convert_dino_vit(sd)
    merged = insert_converted({"vit": params}, converted, ("vit",))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), v)
        for path, v in jax.tree_util.tree_leaves_with_path(merged["vit"])
    )
    for path, v in flat_a:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[key]), atol=0)


def test_layout_converters_against_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 9, 11).astype(np.float32)  # NCHW
    w = rng.randn(6, 4, 3, 3).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    xf = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    got = jax.lax.conv_general_dilated(
        xf, jnp.asarray(t2f_conv(w)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",  # default conv precision is reduced on CPU too
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )

    # conv transpose: torch (in, out, kh, kw), stride 2
    wt = rng.randn(4, 6, 2, 2).astype(np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(wt), stride=2).numpy()
    import flax.linen as nn

    conv_t = nn.ConvTranspose(6, (2, 2), strides=(2, 2), use_bias=False, precision="highest")
    vars_ct = {"params": {"kernel": jnp.asarray(t2f_conv_transpose(wt).copy())}}
    got = conv_t.apply(vars_ct, xf)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )

    # linear (explicit precision: this environment sets a reduced default
    # matmul precision even on CPU)
    wl = rng.randn(5, 7).astype(np.float32)
    xl = rng.randn(3, 7).astype(np.float32)
    ref = (torch.from_numpy(xl) @ torch.from_numpy(wl).T).numpy()
    got = np.asarray(
        jnp.einsum("ij,jk->ik", jnp.asarray(xl), jnp.asarray(t2f_linear(wl)),
                   precision="highest")
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
