"""Structural validation of the full estimator-checkpoint converter
(convert_patchrefinerplus): a synthetic torch state dict with the
reference's save-dict key names (patchrefinerplus.py attribute tree:
coarse_branch ZoeDepth incl. bins head, refiner_fine_branch timm encoder,
refiner_fusion_model BiDirectionalFusion) is inverse-built from the
flagship flax tree's shapes, converted, and must graft back exactly.

Per-block numerics are pinned separately by the torch-forward parity
tests; this test pins the KEY MAP over the whole flagship model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchrefinerv2_tpu.registry import MODELS
from patchrefinerv2_tpu.utils.torch_convert import convert_patchrefinerplus


def _flagship_tiny_cfg():
    # flagship topology (ZoeDepth BEiT coarse + eff-b5 refiner + V2 fusion)
    # with a debug-tiny BEiT trunk for a fast eval_shape
    return dict(
        e2e_training=False,
        pretrain_stage=False,
        image_raw_shape=[192, 256],
        patch_process_shape=[96, 128],
        patch_split_num=[2, 2],
        fusion_feat_level=6,
        min_depth=1e-3,
        max_depth=80,
        strategy_refiner_target="offset_coarse",
        coarse_branch=dict(
            type="ZoeDepth",
            n_bins=16,
            bin_centers_type="softplus",
            bin_embedding_dim=32,
            n_attractors=[4, 2, 2, 1],
            attractor_alpha=1000,
            attractor_kind="mean",
            attractor_type="inv",
        ),
        refiner=dict(
            fine_branch=dict(
                type="LightWeightRefiner",
                coarse_condition=True,
                with_decoder=False,
                encoder_name="tf_efficientnet_b5_ap",
            ),
            fusion_model=dict(
                type="BiDirectionalFusion",
                coarse2fine=True,
                coarse2fine_type="coarse-gated",
                coarse_chl=[32, 256, 256, 256, 256, 256],
                fine_chl=[24, 40, 64, 176, 512],
                fine_chl_after_coarse2fine=[32, 256, 256, 256, 256, 256],
                temp_chl=[32, 64, 64, 128, 256, 512],
                dec_chl=[512, 256, 128, 64, 32],
                c2f_features=64,
            ),
        ),
        sigloss=dict(type="SILogLoss"),
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


def _f2t_conv(shape):  # (kh, kw, I, O) -> torch (O, I, kh, kw)
    kh, kw, i, o = shape
    return (o, i, kh, kw)


def _f2t_convT(shape):  # flax ConvTranspose (kh, kw, O?, I?) -> torch (I, O, kh, kw)
    kh, kw, a, b = shape
    return (b, a, kh, kw)


def _f2t_linear(shape):
    i, o = shape
    return (o, i)


def _inverse_sd(flax_paths):
    """Emit the torch-side key for each flax leaf of the three families."""
    rng = np.random.RandomState(0)
    sd = {}

    def put(key, shape):
        sd[key] = rng.randn(*shape).astype(np.float32)

    for path, shape in flax_paths.items():
        col, sub = path[0], path[1:]
        leaf = sub[-1]
        if col == "batch_stats":
            # timm encoder BN running stats handled with params below
            continue
        fam = sub[0]
        if fam == "coarse":
            tp = _torch_key_coarse(sub[1:])
        elif fam == "fine":
            tp = _torch_key_fine(sub[1:])
        elif fam == "fusion":
            tp = _torch_key_fusion(sub[1:])
        else:
            continue
        if tp is None:
            continue
        key, kind = tp
        if kind == "conv":
            put(key, _f2t_conv(shape))
        elif kind == "convT":
            put(key, _f2t_convT(shape))
        elif kind == "linear":
            put(key, _f2t_linear(shape))
        else:
            put(key, shape)
    return sd


def _torch_key_coarse(sub):
    """flax ('core'|'head', ...) -> reference coarse_branch.* torch key."""
    head, rest = sub[0], sub[1:]
    if head == "head":
        mod = rest[0]
        leaf = rest[-1]
        wb = "weight" if leaf == "kernel" else "bias"
        if mod == "conv2":
            return f"coarse_branch.conv2.{wb}", "conv" if leaf == "kernel" else "raw"
        table = {
            "seed_bin_regressor": "seed_bin_regressor",
            "seed_projector": "seed_projector",
            "conditional_log_binomial": "conditional_log_binomial",
        }
        if mod.startswith("projector"):
            base = f"projectors.{mod[len('projector'):]}"
        elif mod.startswith("attractor"):
            base = f"attractors.{mod[len('attractor'):]}"
        elif mod in table:
            base = table[mod]
        else:
            return None
        seq = "mlp" if mod == "conditional_log_binomial" else "_net"
        idx = {"Conv_0": 0, "Conv_1": 2}[rest[1]]
        return (
            f"coarse_branch.{base}.{seq}.{idx}.{wb}",
            "conv" if leaf == "kernel" else "raw",
        )
    # core -> MiDaS DPT_BEiT keys under coarse_branch.core.core.: covered
    # by the dedicated beit round-trip test; skip here to keep this test
    # focused (the converter call still runs over the full dict)
    return None


def _torch_key_fine(sub):
    # fine/refiner_encoder/... covered by the timm converter tests; skip
    return None


def _gcu_key(base, rest):
    leaf = rest[-1]
    wb = "weight" if leaf in ("kernel", "scale") else "bias"
    m = {
        "Conv_0": (".conv", "conv"),
        "Conv_1": (".fusion_conv.0", "conv"),
        "LayerNorm_0": (".fusion_conv.1", "raw"),
        "Conv_2": (".fusion_conv.3", "conv"),
    }[rest[0]]
    return base + m[0] + "." + wb, (m[1] if leaf == "kernel" else "raw")


def _gfb_key(base, rest, single_input):
    if rest[0] == "Conv_0":  # out_conv
        leaf = rest[-1]
        return base + ".out_conv." + ("weight" if leaf == "kernel" else "bias"), (
            "conv" if leaf == "kernel" else "raw"
        )
    unit = rest[0]
    if single_input:
        torch_unit = ".GateresConfUnit2"
    else:
        torch_unit = ".GateresConfUnit1" if unit == "GatedConvUnit_0" else ".GateresConfUnit2"
    return _gcu_key(base + torch_unit, rest[1:])


def _torch_key_fusion(sub):
    mod, rest = sub[0], sub[1:]
    leaf = rest[-1]
    wb = "weight" if leaf in ("kernel", "scale") else "bias"
    P = "refiner_fusion_model."
    if mod == "final_conv":
        return P + "final_conv.weight", "conv"
    if mod.startswith("fusion1_") or mod.startswith("fusion2_"):
        fam = "fusion_layers_1" if mod.startswith("fusion1_") else "fusion_layers_2"
        i = mod.split("_")[-1]
        idx = {"Conv_0": 0, "LayerNorm_0": 1}[rest[0]]
        return (
            f"{P}{fam}.{i}.single_conv.{idx}.{wb}",
            "conv" if leaf == "kernel" else "raw",
        )
    if mod.startswith("f2r_agg_"):
        i = mod.split("_")[-1]
        idx = {"Conv_0": 0, "Conv_1": 2}[rest[1]]
        return f"{P}f2r_agg.{i}.conv.double_conv.{idx}.weight", "conv"
    if mod == "c2f":
        c = rest[0]
        if c == "Scratch_0":
            return f"{P}c2f.scratch.{rest[1]}.weight", "conv"
        if c.startswith("refinenet"):
            return _gfb_key(
                P + "c2f.scratch." + c, rest[1:], single_input=(c == "refinenet5")
            )
        if c == "output_conv2_fusion":
            return _gfb_key(P + "c2f.scratch." + c, rest[1:], single_input=True)
        if c in ("output_conv1",):
            return (
                f"{P}c2f.scratch.output_conv1.{wb}",
                "conv" if leaf == "kernel" else "raw",
            )
        if c == "output_conv2":
            return (
                f"{P}c2f.scratch.output_conv2.0.{wb}",
                "conv" if leaf == "kernel" else "raw",
            )
        if c == "output_conv3":
            return (
                f"{P}c2f.scratch.output_conv3.0.{wb}",
                "conv" if leaf == "kernel" else "raw",
            )
    return None


def test_estimator_converter_grafts_flagship_tree():
    model = MODELS.build(dict(type="PatchRefinerPlus", config=_flagship_tiny_cfg()))
    pph, ppw = model.patch_input_shape
    clh, clw = model.coarse_input_shape(model.patch_process_shape)
    image_lr = jnp.zeros((1, clh, clw, 3), jnp.float32)
    crops = jnp.zeros((1, pph, ppw, 3), jnp.float32)
    bboxs = jnp.asarray([[0.0, 0.0, ppw / 4, pph / 4]], jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.net.init(
            r, image_lr, crops, bboxs, method=type(model.net).train_forward
        ),
        jax.random.PRNGKey(0),
    )
    flax_paths = _tree_paths(shapes)

    sd = _inverse_sd(flax_paths)
    assert len(sd) > 150, f"synthetic sd too small: {len(sd)}"
    tree = convert_patchrefinerplus(sd)

    got = _tree_paths(tree["params"])
    exp_head = {
        p[1:]: s for p, s in flax_paths.items()
        if p[0] == "params" and p[1] == "coarse" and p[2] == "head"
    }
    exp_fusion = {
        p[1:]: s for p, s in flax_paths.items()
        if p[0] == "params" and p[1] == "fusion"
    }
    for exp in (exp_head, exp_fusion):
        missing = set(exp) - set(got)
        assert not missing, f"converter missing {sorted(missing)[:6]}"
        for p, s in exp.items():
            assert got[p] == s, f"{p}: {got[p]} != {s}"
    # no unexpected keys inside the converted families
    fam_keys = {p for p in got if p[0] in ("fusion",) or (p[0], p[1]) == ("coarse", "head")}
    extra = fam_keys - set(exp_head) - set(exp_fusion)
    assert not extra, f"unexpected converted keys {sorted(extra)[:6]}"
