"""Structural validation of convert_patchfusion: a synthetic torch state
dict with the reference PatchFusion save-dict names (patchfusion.py:
fusion_conv_list, guided_fusion U-Net + G2L swin, top-level bins-head
re-run) is inverse-built from the tiny PF flax tree's shapes, converted,
and must match the guided_fusion/fusion_conv/bins_head subtrees exactly
(the coarse/fine ZoeDepth halves are covered by their own tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.utils.torch_convert import convert_patchfusion
from tests.test_models_extra import _coarse_cfg


def _tiny_pf():
    return dict(
        image_raw_shape=[168, 224],
        patch_process_shape=[84, 112],
        patch_split_num=[2, 2],
        min_depth=1e-3,
        max_depth=80,
        coarse_branch=_coarse_cfg(),
        fine_branch=_coarse_cfg(),
        guided_fusion=dict(
            type="GuidedFusionPatchFusion",
            n_channels=5,
            g2l=True,
            in_channels=[32, 64, 64, 64, 64, 64],
            depth=[1, 1, 1, 1, 1, 1],
            num_heads=[2, 2, 2, 2, 2, 2],
            num_patches=[84 * 112, 48 * 64, 24 * 32, 12 * 16, 6 * 8, 3 * 4],
            window=4,
        ),
        sigloss=dict(type="SILogLoss"),
        load_branch=False,
        pre_norm_bbox=True,
    )


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _f2t_conv(shape):
    kh, kw, i, o = shape
    return (o, i, kh, kw)


def _inverse_key(col, sub):
    """flax (collection, path...) -> (torch key, layout kind) or None."""
    fam = sub[0]
    leaf = sub[-1]
    wb_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}
    wb = wb_map.get(leaf, leaf)

    if fam.startswith("fusion_conv"):
        i = fam[len("fusion_conv"):]
        return f"fusion_conv_list.{i}.{wb}", ("conv" if leaf == "kernel" else "raw")

    if fam == "bins_head":
        mod = sub[1]
        if mod.startswith("projector"):
            base = f"projectors.{mod[len('projector'):]}._net"
        elif mod.startswith("attractor"):
            base = f"attractors.{mod[len('attractor'):]}._net"
        elif mod == "conditional_log_binomial":
            base = "conditional_log_binomial.mlp"
        elif mod in ("seed_bin_regressor", "seed_projector"):
            base = f"{mod}._net"
        else:
            return None
        idx = {"Conv_0": 0, "Conv_1": 2}[sub[2]]
        return f"{base}.{idx}.{wb}", ("conv" if leaf == "kernel" else "raw")

    if fam == "guided_fusion":
        P = "guided_fusion."
        mod = sub[1]

        def dconv_bn(base, rest):
            part = rest[0]
            m = {"Conv_0": 0, "BatchNorm_0": 1, "Conv_1": 3, "BatchNorm_1": 4}[part]
            kind = "conv" if (part.startswith("Conv") and leaf == "kernel") else "raw"
            return f"{base}.double_conv.{m}.{wb}", kind

        def dconv_wobn(base, rest):
            m = {"Conv_0": 0, "Conv_1": 2}[rest[0]]
            return f"{base}.double_conv.{m}.{wb}", ("conv" if leaf == "kernel" else "raw")

        if mod == "inc":
            return_key = dconv_bn(P + "inc", sub[2:])
            return return_key
        if mod.startswith("down_list_"):
            i = mod.split("_")[-1]
            return dconv_bn(f"{P}down_conv_list.{i}.maxpool_conv.1", sub[3:])
        if mod.startswith("up_list_"):
            i = mod.split("_")[-1]
            return dconv_wobn(f"{P}up_conv_list.{i}.conv", sub[2:])
        if mod.startswith("conv_list_"):
            i = mod.split("_")[-1]
            return dconv_wobn(f"{P}convs.{i}", sub[2:])
        if mod.startswith("g2l_list_"):
            i = mod.split("_")[-1]
            base = f"{P}g2l_list.{i}"
            g = sub[2]
            if g == "embed_proj":
                return f"{base}.embed_proj.{wb}", ("conv" if leaf == "kernel" else "raw")
            if g == "absolute_pos_embed":
                return f"{base}.absolute_pos_embed", "raw"
            if g == "g2l_layer_norm":
                return f"{base}.g2l_layer_norm.{wb}", "raw"
            if g.startswith("block"):
                j = g[len("block"):]
                bb = f"{base}.g2l_layer.blocks.{j}"
                part = sub[3]
                if part in ("norm1", "norm2"):
                    return f"{bb}.{part}.{wb}", "raw"
                if part in ("fc1", "fc2"):
                    return f"{bb}.mlp.{part}.{wb}", ("linear" if leaf == "kernel" else "raw")
                if part == "attn":
                    a = sub[4]
                    if a == "relative_position_bias_table":
                        return f"{bb}.attn.relative_position_bias_table", "raw"
                    return f"{bb}.attn.{a}.{wb}", ("linear" if leaf == "kernel" else "raw")
    return None


def test_patchfusion_converter_grafts_tiny_tree():
    model = MODELS.build(dict(type="PatchFusion", config=_tiny_pf()))
    shapes = jax.eval_shape(lambda r: model.init(r), jax.random.PRNGKey(0))
    flax_paths = _tree_paths(shapes)

    rng = np.random.RandomState(0)
    sd = {}
    for path, shape in flax_paths.items():
        col, sub = path[0], path[1:]
        if sub[0] not in ("guided_fusion", "bins_head") and not sub[0].startswith("fusion_conv"):
            continue
        tk = _inverse_key(col, sub)
        assert tk is not None, f"no inverse key for {path}"
        key, kind = tk
        if kind == "conv":
            tshape = _f2t_conv(shape)
        elif kind == "linear":
            tshape = (shape[1], shape[0])
        else:
            tshape = shape
        sd[key] = rng.randn(*tshape).astype(np.float32)

    assert len(sd) > 80, len(sd)
    tree = convert_patchfusion(sd)

    got_p = _tree_paths(tree["params"])
    got_s = _tree_paths(tree["batch_stats"])
    for col, got in (("params", got_p), ("batch_stats", got_s)):
        exp = {
            p[1:]: s for p, s in flax_paths.items()
            if p[0] == col and (
                p[1] in ("guided_fusion", "bins_head") or p[1].startswith("fusion_conv")
            )
        }
        got_fam = {
            p: s for p, s in got.items()
            if p[0] in ("guided_fusion", "bins_head") or p[0].startswith("fusion_conv")
        }
        missing = set(exp) - set(got_fam)
        extra = set(got_fam) - set(exp)
        assert not missing, f"{col} missing {sorted(missing)[:6]}"
        assert not extra, f"{col} extra {sorted(extra)[:6]}"
        for p, s in exp.items():
            assert got_fam[p] == s, (col, p, got_fam[p], s)
