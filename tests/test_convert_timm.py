"""Structural validation of the timm-encoder checkpoint converters.

Zero-egress build: no timm and no real checkpoints in the image, so these
tests construct synthetic state dicts that follow timm's key conventions
(written out independently here from the timm efficientnet/mobilenetv3/
convnext module layouts) and assert the converter emits exactly the flax
tree our encoders expect — every leaf present, every shape right (via
jax.eval_shape, no compute). Numeric parity vs real timm weights is a
known TODO pending weight availability (INVENTORY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchrefinerv2_tpu.models.backbones.convnext import ConvNeXtFeatures
from patchrefinerv2_tpu.models.backbones.encoders import (
    EfficientNetB5Features,
    MobileNetV3LargeFeatures,
    _make_divisible,
)
from patchrefinerv2_tpu.utils.torch_convert import (
    convert_timm_convnext,
    convert_timm_mbnet,
    patch_stem_to_4ch,
)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _bn_keys(sd, rng, base, c):
    sd[base + ".weight"] = _rand(rng, c)
    sd[base + ".bias"] = _rand(rng, c)
    sd[base + ".running_mean"] = _rand(rng, c)
    sd[base + ".running_var"] = np.abs(_rand(rng, c)) + 0.5
    sd[base + ".num_batches_tracked"] = np.asarray(0)


def synthetic_mnv3_sd(rng):
    """mobilenetv3_large_100 timm state dict (keys + shapes)."""
    sd = {}
    sd["conv_stem.weight"] = _rand(rng, 16, 3, 3, 3)
    _bn_keys(sd, rng, "bn1", 16)
    # (kernel, exp_ch, out_ch, se, stride) rows — timm mobilenetv3_large_100
    stages = [
        [(3, 16, 16, False, 1)],  # DSConv
        [(3, 64, 24, False, 2), (3, 72, 24, False, 1)],
        [(5, 72, 40, True, 2), (5, 120, 40, True, 1), (5, 120, 40, True, 1)],
        [
            (3, 240, 80, False, 2), (3, 200, 80, False, 1),
            (3, 184, 80, False, 1), (3, 184, 80, False, 1),
            (3, 480, 112, True, 1), (3, 672, 112, True, 1),
        ],
        [(5, 672, 160, True, 2), (5, 960, 160, True, 1), (5, 960, 160, True, 1)],
    ]
    in_ch = 16
    for si, stage in enumerate(stages):
        for bi, (k, exp, out, se, stride) in enumerate(stage):
            b = f"blocks.{si}.{bi}"
            if exp == in_ch and si == 0:  # DepthwiseSeparableConv
                sd[b + ".conv_dw.weight"] = _rand(rng, exp, 1, k, k)
                _bn_keys(sd, rng, b + ".bn1", exp)
                sd[b + ".conv_pw.weight"] = _rand(rng, out, exp, 1, 1)
                _bn_keys(sd, rng, b + ".bn2", out)
            else:  # InvertedResidual
                sd[b + ".conv_pw.weight"] = _rand(rng, exp, in_ch, 1, 1)
                _bn_keys(sd, rng, b + ".bn1", exp)
                sd[b + ".conv_dw.weight"] = _rand(rng, exp, 1, k, k)
                _bn_keys(sd, rng, b + ".bn2", exp)
                sd[b + ".conv_pwl.weight"] = _rand(rng, out, exp, 1, 1)
                _bn_keys(sd, rng, b + ".bn3", out)
            if se:
                red = _make_divisible(exp // 4)
                sd[b + ".se.conv_reduce.weight"] = _rand(rng, red, exp, 1, 1)
                sd[b + ".se.conv_reduce.bias"] = _rand(rng, red)
                sd[b + ".se.conv_expand.weight"] = _rand(rng, exp, red, 1, 1)
                sd[b + ".se.conv_expand.bias"] = _rand(rng, exp)
            in_ch = out
    # final ConvBnAct 960 stage (timm blocks.5.0 once 5 stages consumed;
    # mobilenetv3_large_100 has it as its own stage)
    sd["blocks.5.0.conv.weight"] = _rand(rng, 960, 160, 1, 1)
    _bn_keys(sd, rng, "blocks.5.0.bn1", 960)
    return sd


# EfficientNet-B5 stage table (k, stride, expand, out, repeats)
_B5 = [
    (3, 1, 1, 24, 3),
    (3, 2, 6, 40, 5),
    (5, 2, 6, 64, 5),
    (3, 2, 6, 128, 7),
    (5, 1, 6, 176, 7),
    (5, 2, 6, 304, 9),
    (3, 1, 6, 512, 3),
]


def synthetic_effb5_sd(rng):
    sd = {}
    sd["conv_stem.weight"] = _rand(rng, 48, 3, 3, 3)
    _bn_keys(sd, rng, "bn1", 48)
    in_ch = 48
    for si, (k, s, e, out, r) in enumerate(_B5):
        for bi in range(r):
            b = f"blocks.{si}.{bi}"
            mid = in_ch * e
            red = max(1, int(in_ch * 0.25))
            if e == 1:  # DepthwiseSeparableConv (stage 0)
                sd[b + ".conv_dw.weight"] = _rand(rng, in_ch, 1, k, k)
                _bn_keys(sd, rng, b + ".bn1", in_ch)
                sd[b + ".conv_pw.weight"] = _rand(rng, out, in_ch, 1, 1)
                _bn_keys(sd, rng, b + ".bn2", out)
                se_ch = in_ch
            else:
                sd[b + ".conv_pw.weight"] = _rand(rng, mid, in_ch, 1, 1)
                _bn_keys(sd, rng, b + ".bn1", mid)
                sd[b + ".conv_dw.weight"] = _rand(rng, mid, 1, k, k)
                _bn_keys(sd, rng, b + ".bn2", mid)
                sd[b + ".conv_pwl.weight"] = _rand(rng, out, mid, 1, 1)
                _bn_keys(sd, rng, b + ".bn3", out)
                se_ch = mid
            sd[b + ".se.conv_reduce.weight"] = _rand(rng, red, se_ch, 1, 1)
            sd[b + ".se.conv_reduce.bias"] = _rand(rng, red)
            sd[b + ".se.conv_expand.weight"] = _rand(rng, se_ch, red, 1, 1)
            sd[b + ".se.conv_expand.bias"] = _rand(rng, se_ch)
            in_ch = out
    return sd


def synthetic_convnext_sd(rng, v2=True, depths=(2, 2, 4, 2), dims=(32, 64, 128, 256)):
    sd = {}
    sd["stem.0.weight"] = _rand(rng, dims[0], 3, 4, 4)
    sd["stem.0.bias"] = _rand(rng, dims[0])
    sd["stem.1.weight"] = _rand(rng, dims[0])
    sd["stem.1.bias"] = _rand(rng, dims[0])
    prev = dims[0]
    for s, (d, dim) in enumerate(zip(depths, dims)):
        if s > 0:
            sd[f"stages.{s}.downsample.0.weight"] = _rand(rng, prev)
            sd[f"stages.{s}.downsample.0.bias"] = _rand(rng, prev)
            sd[f"stages.{s}.downsample.1.weight"] = _rand(rng, dim, prev, 2, 2)
            sd[f"stages.{s}.downsample.1.bias"] = _rand(rng, dim)
        for b in range(d):
            base = f"stages.{s}.blocks.{b}"
            sd[base + ".conv_dw.weight"] = _rand(rng, dim, 1, 7, 7)
            sd[base + ".conv_dw.bias"] = _rand(rng, dim)
            sd[base + ".norm.weight"] = _rand(rng, dim)
            sd[base + ".norm.bias"] = _rand(rng, dim)
            sd[base + ".mlp.fc1.weight"] = _rand(rng, dim * 4, dim)
            sd[base + ".mlp.fc1.bias"] = _rand(rng, dim * 4)
            sd[base + ".mlp.fc2.weight"] = _rand(rng, dim, dim * 4)
            sd[base + ".mlp.fc2.bias"] = _rand(rng, dim)
            if v2:
                sd[base + ".mlp.grn.weight"] = _rand(rng, dim * 4)
                sd[base + ".mlp.grn.bias"] = _rand(rng, dim * 4)
            else:
                sd[base + ".gamma"] = _rand(rng, dim)
        prev = dim
    return sd


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            shape = v.shape if hasattr(v, "shape") else np.asarray(v).shape
            out[prefix + (k,)] = tuple(shape)
    return out


def _assert_tree_matches(converted, expected_shapes, collection):
    got = _tree_paths(converted)
    exp = {p: s for p, s in expected_shapes.items() if p[0] == collection}
    exp = {p[1:]: s for p, s in exp.items()}
    missing = set(exp) - set(got)
    extra = set(got) - set(exp)
    assert not missing, f"converter missing {sorted(missing)[:8]}"
    assert not extra, f"converter emitted unknown {sorted(extra)[:8]}"
    for p, s in exp.items():
        assert got[p] == s, f"{p}: converted {got[p]} != module {s}"


def _expected_shapes(module, in_ch):
    shapes = jax.eval_shape(
        lambda r: module.init(r, jnp.zeros((1, 64, 64, in_ch)), False),
        jax.random.PRNGKey(0),
    )
    return _tree_paths(shapes)


@pytest.mark.parametrize("in_ch", [3, 4])
def test_mobilenetv3_converter(in_ch):
    rng = np.random.RandomState(0)
    sd = synthetic_mnv3_sd(rng)
    out = convert_timm_mbnet(sd, in_ch=in_ch)
    exp = _expected_shapes(MobileNetV3LargeFeatures(in_ch=in_ch), in_ch)
    _assert_tree_matches(out["params"], exp, "params")
    _assert_tree_matches(out["batch_stats"], exp, "batch_stats")
    # spot-check a value: depthwise kernel transposed (O,1,k,k)->(k,k,1,O)
    src = sd["blocks.2.1.conv_dw.weight"]
    got = out["params"]["blocks_2_1"]["conv_dw"]["kernel"]
    np.testing.assert_array_equal(got, np.transpose(src, (2, 3, 1, 0)))


@pytest.mark.parametrize("in_ch", [3, 4])
def test_efficientnet_b5_converter(in_ch):
    rng = np.random.RandomState(1)
    sd = synthetic_effb5_sd(rng)
    out = convert_timm_mbnet(sd, in_ch=in_ch)
    exp = _expected_shapes(EfficientNetB5Features(in_ch=in_ch), in_ch)
    _assert_tree_matches(out["params"], exp, "params")
    _assert_tree_matches(out["batch_stats"], exp, "batch_stats")
    if in_ch == 4:
        # 4th stem channel zero-filled (patchrefinerplus.py:153-159)
        stem = out["params"]["conv_stem"]["kernel"]
        assert stem.shape[2] == 4 and not stem[:, :, 3].any()


@pytest.mark.parametrize("v2", [True, False])
def test_convnext_converter(v2):
    rng = np.random.RandomState(2)
    depths, dims = (2, 2, 4, 2), (32, 64, 128, 256)
    sd = synthetic_convnext_sd(rng, v2=v2, depths=depths, dims=dims)
    out = convert_timm_convnext(sd, v2=v2)
    mod = ConvNeXtFeatures(depths=depths, dims=dims, v2=v2)
    exp = _expected_shapes(mod, 3)
    _assert_tree_matches(out["params"], exp, "params")


def test_patch_stem_to_4ch():
    k = np.arange(2 * 2 * 3 * 5, dtype=np.float32).reshape(2, 2, 3, 5)
    p = patch_stem_to_4ch(k)
    assert p.shape == (2, 2, 4, 5)
    np.testing.assert_array_equal(p[:, :, :3], k)
    assert not p[:, :, 3].any()
