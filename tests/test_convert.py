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


def _torch_sd_for_beit(params):
    """Inverse-map a MidasDPTBEiT flax tree to the MiDaS DPT_BEiT torch
    state_dict schema (midas.py:342-347 hub checkpoint layout)."""
    sd = {}
    t = "pretrained.model."
    trunk = params["pretrained"]
    sd[t + "cls_token"] = np.asarray(trunk["cls_token"])
    k = np.asarray(trunk["patch_embed"]["kernel"])
    sd[t + "patch_embed.proj.weight"] = np.transpose(k, (3, 2, 0, 1))
    sd[t + "patch_embed.proj.bias"] = np.asarray(trunk["patch_embed"]["bias"])
    i = 0
    while f"block{i}" in trunk:
        b = trunk[f"block{i}"]
        pre = t + f"blocks.{i}."
        sd[pre + "gamma_1"] = np.asarray(b["gamma_1"])
        sd[pre + "gamma_2"] = np.asarray(b["gamma_2"])
        for n in ("norm1", "norm2"):
            sd[pre + n + ".weight"] = np.asarray(b[n]["scale"])
            sd[pre + n + ".bias"] = np.asarray(b[n]["bias"])
        sd[pre + "attn.qkv.weight"] = np.asarray(b["attn"]["qkv"]["kernel"]).T
        sd[pre + "attn.q_bias"] = np.asarray(b["attn"]["q_bias"])
        sd[pre + "attn.v_bias"] = np.asarray(b["attn"]["v_bias"])
        sd[pre + "attn.relative_position_bias_table"] = np.asarray(
            b["attn"]["relative_position_bias_table"]
        )
        sd[pre + "attn.proj.weight"] = np.asarray(b["attn"]["proj"]["kernel"]).T
        sd[pre + "attn.proj.bias"] = np.asarray(b["attn"]["proj"]["bias"])
        sd[pre + "mlp.fc1.weight"] = np.asarray(b["fc1"]["kernel"]).T
        sd[pre + "mlp.fc1.bias"] = np.asarray(b["fc1"]["bias"])
        sd[pre + "mlp.fc2.weight"] = np.asarray(b["fc2"]["kernel"]).T
        sd[pre + "mlp.fc2.bias"] = np.asarray(b["fc2"]["bias"])
        i += 1
    resize_name = {0: "resize0", 1: "resize1", 3: "resize3"}
    for j in range(4):
        ap = f"pretrained.act_postprocess{j + 1}."
        sd[ap + "0.project.0.weight"] = np.asarray(params[f"readout{j}"]["kernel"]).T
        sd[ap + "0.project.0.bias"] = np.asarray(params[f"readout{j}"]["bias"])
        k = np.asarray(params[f"project{j}"]["kernel"])
        sd[ap + "3.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[ap + "3.bias"] = np.asarray(params[f"project{j}"]["bias"])
        if j in (0, 1):
            k = np.asarray(params[resize_name[j]]["kernel"])  # (kh,kw,O,I) flipped
            sd[ap + "4.weight"] = np.transpose(k[::-1, ::-1], (2, 3, 0, 1))
            sd[ap + "4.bias"] = np.asarray(params[resize_name[j]]["bias"])
        elif j == 3:
            k = np.asarray(params[resize_name[j]]["kernel"])
            sd[ap + "4.weight"] = np.transpose(k, (3, 2, 0, 1))
            sd[ap + "4.bias"] = np.asarray(params[resize_name[j]]["bias"])
    for r in range(1, 5):
        k = np.asarray(params[f"layer{r}_rn"]["kernel"])
        sd[f"scratch.layer{r}_rn.weight"] = np.transpose(k, (3, 2, 0, 1))
        fb = params[f"refinenet{r}"]
        base = f"scratch.refinenet{r}"
        if r == 4:
            # single-input head: flax Unit_0 == torch resConfUnit2; the real
            # checkpoint also carries a dead resConfUnit1 the converter must drop
            unit_map = [("resConfUnit2", 0)]
            f = np.asarray(fb["ResidualConvUnit_0"]["Conv_0"]["kernel"]).shape[-1]
            for cname in ("conv1", "conv2"):
                sd[f"{base}.resConfUnit1.{cname}.weight"] = np.zeros((f, f, 3, 3), np.float32)
                sd[f"{base}.resConfUnit1.{cname}.bias"] = np.zeros((f,), np.float32)
        else:
            unit_map = [("resConfUnit1", 0), ("resConfUnit2", 1)]
        for unit, unit_idx in unit_map:
            u = fb[f"ResidualConvUnit_{unit_idx}"]
            for ci, cname in ((0, "conv1"), (1, "conv2")):
                k = np.asarray(u[f"Conv_{ci}"]["kernel"])
                sd[f"{base}.{unit}.{cname}.weight"] = np.transpose(k, (3, 2, 0, 1))
                sd[f"{base}.{unit}.{cname}.bias"] = np.asarray(u[f"Conv_{ci}"]["bias"])
        k = np.asarray(fb["Conv_0"]["kernel"])
        sd[f"{base}.out_conv.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"{base}.out_conv.bias"] = np.asarray(fb["Conv_0"]["bias"])
    for flax_name, torch_idx in (("output_conv1", 0), ("output_conv2_0", 2), ("output_conv2_1", 4)):
        k = np.asarray(params[flax_name]["kernel"])
        sd[f"scratch.output_conv.{torch_idx}.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"scratch.output_conv.{torch_idx}.bias"] = np.asarray(params[flax_name]["bias"])
    return sd


def test_beit_midas_convert_roundtrip():
    from patchrefinerv2_tpu.models.backbones.beit import MidasDPTBEiT
    from patchrefinerv2_tpu.utils.torch_convert import convert_beit_midas

    net = MidasDPTBEiT(
        features=16, out_channels=(8, 12, 16, 16),
        embed_dim=32, depth=4, num_heads=2, taps=(0, 1, 2, 3),
    )
    x = jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(lambda r: net.init(r, x))(jax.random.PRNGKey(0))
    params = variables["params"]
    # randomize so equal-by-accident is impossible
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rng.randn(*l.shape), jnp.float32) for l in leaves]
    )
    sd = _torch_sd_for_beit(params)
    converted = convert_beit_midas(sd)
    merged = insert_converted({"core": params}, converted, ("core",))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), v)
        for path, v in jax.tree_util.tree_leaves_with_path(merged["core"])
    )
    for path, v in flat_a:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[key]), atol=0)
